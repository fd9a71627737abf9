"""Legacy-VTK export (the reference's output_results analog,
testcase2 main.cpp:322-350: solution + partitioning + μ fields).

Writes ASCII legacy .vtk files viewable in ParaView:
  * write_structured_vtk — STRUCTURED_GRID of a (nx, ny, nz) node lattice
    with point-data fields (solution, mu at dofs, ...);
  * write_tet_vtk — UNSTRUCTURED_GRID of a TetMesh with point/cell data.
"""

from __future__ import annotations

import numpy as np


def _write_fields(f, fields: dict, n: int, kind: str):
    if not fields:
        return
    f.write(f"{kind} {n}\n")
    for name, data in fields.items():
        data = np.asarray(data, dtype=np.float64).reshape(n, -1)
        comps = data.shape[1]
        f.write(f"SCALARS {name} double {comps}\n")
        f.write("LOOKUP_TABLE default\n")
        for row in data:
            f.write(" ".join(f"{v:.10e}" for v in row) + "\n")


def write_structured_vtk(path: str, coords_1d, point_fields: dict):
    """coords_1d: per-axis node coordinates (nx,), (ny,), (nz,); fields are
    flat arrays in the (gx·ny + gy)·nz + gz indexing of the FEM modules."""
    xs, ys, zs = (np.asarray(c) for c in coords_1d)
    nx, ny, nz = len(xs), len(ys), len(zs)
    n = nx * ny * nz
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\namg_ann_tpu\nASCII\n")
        f.write("DATASET STRUCTURED_GRID\n")
        # VTK expects x fastest; our flat index has z fastest
        f.write(f"DIMENSIONS {nz} {ny} {nx}\n")
        f.write(f"POINTS {n} double\n")
        for gx in range(nx):
            for gy in range(ny):
                for gz in range(nz):
                    f.write(f"{xs[gx]:.10e} {ys[gy]:.10e} {zs[gz]:.10e}\n")
        _write_fields(f, point_fields, n, "POINT_DATA")


def write_tet_vtk(path: str, mesh, point_fields: dict | None = None,
                  cell_fields: dict | None = None):
    v = np.asarray(mesh.vertices)
    t = np.asarray(mesh.tets)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\namg_ann_tpu\nASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {len(v)} double\n")
        for p in v:
            f.write(f"{p[0]:.10e} {p[1]:.10e} {p[2]:.10e}\n")
        f.write(f"CELLS {len(t)} {len(t) * 5}\n")
        for c in t:
            f.write(f"4 {c[0]} {c[1]} {c[2]} {c[3]}\n")
        f.write(f"CELL_TYPES {len(t)}\n")
        f.write("\n".join(["10"] * len(t)) + "\n")   # VTK_TETRA
        _write_fields(f, point_fields or {}, len(v), "POINT_DATA")
        _write_fields(f, cell_fields or {}, len(t), "CELL_DATA")
