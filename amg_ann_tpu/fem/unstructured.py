"""Unstructured P1 tetrahedral FEM (testcase1 analog).

The reference's testcase1 solves −∇·(μ∇u) = f on ten generated 3-D
domains (Simplex, HyperBall, Cylinder, Cube, Cheese, Torus, ... —
main.cpp:287-322) with per-COARSE-cell random diffusion μ = 10^ε,
ε ~ U(0, max_diffusion) looked up by walking to the base-mesh ancestor
(:245-248,323-332), manufactured tensor-product solutions from
cube_solution with settings (sol_id, sol_freq), and — unlike tc2 — a RHS
WITHOUT μ in the integrand (:261-263). Four DoF renumbering options
(:179-194).

Rebuilt here as genuinely unstructured P1 tets (BASELINE config 3):
mesh generators for the simple domains, red (1→8) uniform refinement with
ancestor tracking, fully vectorized assembly, boundary detection from
once-only faces, and Cuthill–McKee renumbering via scipy.csgraph.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sparse.csr import CSR
from .bc import apply_dirichlet
from .solutions import TensorSolution


# ---------------------------------------------------------------------------
# mesh container + refinement
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class TetMesh:
    vertices: np.ndarray      # (nv, 3)
    tets: np.ndarray          # (nt, 4) int64
    base_cell: np.ndarray     # (nt,) ancestor id in the base mesh

    @property
    def n_vertices(self):
        return self.vertices.shape[0]

    @property
    def n_cells(self):
        return self.tets.shape[0]

    def volumes(self):
        v = self.vertices[self.tets]
        d = v[:, 1:] - v[:, :1]
        return np.abs(np.linalg.det(d)) / 6.0

    def boundary_vertices(self):
        """Vertices on faces that belong to exactly one tet."""
        t = self.tets
        faces = np.concatenate([
            t[:, [0, 1, 2]], t[:, [0, 1, 3]], t[:, [0, 2, 3]],
            t[:, [1, 2, 3]],
        ])
        faces = np.sort(faces, axis=1)
        _, inv, counts = np.unique(faces, axis=0, return_inverse=True,
                                   return_counts=True)
        boundary_faces = faces[counts[inv] == 1]
        return np.unique(boundary_faces)


def refine(mesh: TetMesh) -> TetMesh:
    """Red refinement: each tet → 8 (4 corners + octahedron split)."""
    t = mesh.tets
    edges = np.concatenate([
        t[:, [0, 1]], t[:, [0, 2]], t[:, [0, 3]],
        t[:, [1, 2]], t[:, [1, 3]], t[:, [2, 3]],
    ])
    edges = np.sort(edges, axis=1)
    uniq, inv = np.unique(edges, axis=0, return_inverse=True)
    mid = 0.5 * (mesh.vertices[uniq[:, 0]] + mesh.vertices[uniq[:, 1]])
    nv = mesh.n_vertices
    verts = np.concatenate([mesh.vertices, mid])

    nt = mesh.n_cells
    e = inv.reshape(6, nt).T + nv   # midpoint ids: e01,e02,e03,e12,e13,e23
    v0, v1, v2, v3 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    e01, e02, e03, e12, e13, e23 = (e[:, i] for i in range(6))
    corner = [
        (v0, e01, e02, e03), (v1, e01, e12, e13),
        (v2, e02, e12, e23), (v3, e03, e13, e23),
    ]
    # Interior octahedron: split along the SHORTEST of the three diagonals
    # (e01–e23, e02–e13, e03–e12). A fixed choice degrades element quality
    # geometrically under repeated refinement (observed: L2 interpolation
    # order collapses toward 1); the shortest-diagonal rule keeps the
    # family shape-regular.
    d0 = np.linalg.norm(verts[e01] - verts[e23], axis=1)
    d1 = np.linalg.norm(verts[e02] - verts[e13], axis=1)
    d2 = np.linalg.norm(verts[e03] - verts[e12], axis=1)
    choice = np.argmin(np.stack([d0, d1, d2]), axis=0)
    # four octa children per diagonal choice: (diagA, diagB, equator pair)
    octa_cases = [
        [(e01, e23, e02, e03), (e01, e23, e03, e13),
         (e01, e23, e13, e12), (e01, e23, e12, e02)],
        [(e02, e13, e01, e03), (e02, e13, e03, e23),
         (e02, e13, e23, e12), (e02, e13, e12, e01)],
        [(e03, e12, e01, e02), (e03, e12, e02, e23),
         (e03, e12, e23, e13), (e03, e12, e13, e01)],
    ]
    octa = []
    for j in range(4):
        stacked = np.stack(
            [np.stack(octa_cases[c][j], axis=1) for c in range(3)])
        octa.append(stacked[choice, np.arange(nt)])
    children = [np.stack(c, axis=1) for c in corner] + octa
    new_tets = np.concatenate(children)
    new_base = np.tile(mesh.base_cell, 8)
    return TetMesh(verts, new_tets.astype(np.int64), new_base)


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------
_KUHN = [(0, 1, 3, 7), (0, 1, 5, 7), (0, 2, 3, 7),
         (0, 2, 6, 7), (0, 4, 5, 7), (0, 4, 6, 7)]


def _cube_mesh(m: int) -> TetMesh:
    """[-1,1]³ split into m³ hexes, 6 Kuhn tets each."""
    g = np.linspace(-1.0, 1.0, m + 1)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)
    vid = np.arange((m + 1) ** 3).reshape(m + 1, m + 1, m + 1)
    c = np.arange(m)
    cx, cy, cz = np.meshgrid(c, c, c, indexing="ij")
    corner = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner.append(vid[cx + dx, cy + dy, cz + dz].ravel())
    corner = np.stack(corner, axis=1)  # (m³, 8) in (dx,dy,dz) binary order
    tets = np.concatenate([corner[:, list(k)] for k in _KUHN])
    base = np.tile(np.arange(m ** 3), 6)
    return TetMesh(verts, tets.astype(np.int64), base)


def _ball_mesh(m: int) -> TetMesh:
    """Unit ball: cube mesh radially mapped (‖·‖∞ → ‖·‖₂ blending)."""
    mesh = _cube_mesh(m)
    v = mesh.vertices
    linf = np.abs(v).max(axis=1)
    l2 = np.linalg.norm(v, axis=1)
    scale = np.where(l2 > 0, linf / np.where(l2 == 0, 1, l2), 1.0)
    return TetMesh(v * scale[:, None], mesh.tets, mesh.base_cell)


def _cylinder_mesh(m: int) -> TetMesh:
    """Cylinder radius 1, height 2: disk-map x,y; z unchanged."""
    mesh = _cube_mesh(m)
    v = mesh.vertices.copy()
    xy = v[:, :2]
    linf = np.abs(xy).max(axis=1)
    l2 = np.linalg.norm(xy, axis=1)
    scale = np.where(l2 > 0, linf / np.where(l2 == 0, 1, l2), 1.0)
    v[:, :2] = xy * scale[:, None]
    return TetMesh(v, mesh.tets, mesh.base_cell)


def _simplex_mesh() -> TetMesh:
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    return TetMesh(verts, np.array([[0, 1, 2, 3]], dtype=np.int64),
                   np.zeros(1, dtype=np.int64))


def _cheese_mesh(m: int) -> TetMesh:
    """Cube with a periodic pattern of spherical holes (tets removed)."""
    mesh = _cube_mesh(m)
    cent = mesh.vertices[mesh.tets].mean(axis=1)
    # holes of radius 0.22 at a 2×2×2 lattice of centers ±0.5
    holes = np.array([[sx, sy, sz] for sx in (-0.5, 0.5)
                      for sy in (-0.5, 0.5) for sz in (-0.5, 0.5)])
    keep = np.ones(mesh.n_cells, dtype=bool)
    for hc in holes:
        keep &= np.linalg.norm(cent - hc, axis=1) > 0.22
    tets = mesh.tets[keep]
    base = mesh.base_cell[keep]
    used = np.unique(tets)
    remap = -np.ones(mesh.n_vertices, dtype=np.int64)
    remap[used] = np.arange(used.size)
    return TetMesh(mesh.vertices[used], remap[tets], base)


def _torus_mesh(nmaj: int, nmin: int, R: float = 2.0, r: float = 0.5):
    """Solid torus: (θ major) × (square cross-section disk-mapped)."""
    g = np.linspace(-1.0, 1.0, nmin + 1)
    th = np.arange(nmaj) * (2 * np.pi / nmaj)
    # cross-section vertex grid disk-mapped to radius r
    U, V = np.meshgrid(g, g, indexing="ij")
    linf = np.maximum(np.abs(U), np.abs(V))
    l2 = np.sqrt(U**2 + V**2)
    s = np.where(l2 > 0, linf / np.where(l2 == 0, 1, l2), 1.0)
    u, v = (U * s * r).ravel(), (V * s * r).ravel()
    ncs = (nmin + 1) ** 2
    verts = []
    for t in th:
        rad = R + u
        verts.append(np.stack([rad * np.cos(t), rad * np.sin(t),
                               v], axis=-1))
    verts = np.concatenate(verts)
    vid = np.arange(nmaj * ncs).reshape(nmaj, nmin + 1, nmin + 1)
    vid = np.concatenate([vid, vid[:1]])   # wrap θ
    c = np.arange(nmin)
    cu, cv = np.meshgrid(c, c, indexing="ij")
    corner = []
    for dt in (0, 1):
        for du in (0, 1):
            for dv in (0, 1):
                block = vid[np.arange(nmaj)[:, None, None] + dt,
                            cu[None] + du, cv[None] + dv]
                corner.append(block.ravel())
    corner = np.stack(corner, axis=1)
    tets = np.concatenate([corner[:, list(k)] for k in _KUHN])
    base = np.tile(np.arange(nmaj * nmin**2), 6)
    return TetMesh(verts, tets.astype(np.int64), base)


def _filtered_cube(m, keep_fn):
    """Cube mesh with tets removed where keep_fn(centroids) is False."""
    mesh = _cube_mesh(m)
    cent = mesh.vertices[mesh.tets].mean(axis=1)
    keep = keep_fn(cent)
    tets = mesh.tets[keep]
    base = mesh.base_cell[keep]
    used = np.unique(tets)
    remap = -np.ones(mesh.n_vertices, dtype=np.int64)
    remap[used] = np.arange(used.size)
    return TetMesh(mesh.vertices[used], remap[tets], base)


def _plate_with_hole_mesh(m: int) -> TetMesh:
    """Cube with a cylindrical hole through the z axis (deal.II's
    plate_with_a_hole analog)."""
    return _filtered_cube(
        m, lambda c: np.linalg.norm(c[:, :2], axis=1) > 0.4)


def _replicate_holes_mesh(m: int) -> TetMesh:
    """3×2×1 array of unit cubes each pierced by a cylindrical hole along
    z (tc1's ReplicateHoles: hyper_cube_with_cylindrical_hole replicated
    {3,2,1}, main.cpp:311-313)."""
    base = _cube_mesh(m)
    reps = (3, 2, 1)
    verts_l, tets_l, base_l = [], [], []
    off_v = 0
    cell_off = 0
    for ix in range(reps[0]):
        for iy in range(reps[1]):
            for iz in range(reps[2]):
                shift = np.array([2.0 * ix, 2.0 * iy, 2.0 * iz])
                verts_l.append(base.vertices + shift)
                tets_l.append(base.tets + off_v)
                base_l.append(base.base_cell + cell_off)
                off_v += base.n_vertices
                cell_off += base.base_cell.max() + 1
    mesh = TetMesh(np.concatenate(verts_l), np.concatenate(tets_l),
                   np.concatenate(base_l))
    # merge duplicated interface vertices
    verts, inv = np.unique(np.round(mesh.vertices, 12), axis=0,
                           return_inverse=True)
    mesh = TetMesh(verts, inv[mesh.tets], mesh.base_cell)
    # carve the cylindrical holes (radius 0.4 of each replicated cube)
    cent = mesh.vertices[mesh.tets].mean(axis=1)
    local = ((cent[:, :2] + 1.0) % 2.0) - 1.0
    keep = np.linalg.norm(local, axis=1) > 0.4
    tets = mesh.tets[keep]
    bc = mesh.base_cell[keep]
    used = np.unique(tets)
    remap = -np.ones(mesh.n_vertices, dtype=np.int64)
    remap[used] = np.arange(used.size)
    return TetMesh(mesh.vertices[used], remap[tets], bc)


def _replicate_cross_mesh(m: int) -> TetMesh:
    """2×2×2 replicated '3-D plus' pattern: keep where at least two local
    coordinates are near the macro-cell center (tc1's ReplicateCross
    analog — a periodic lattice of cross-shaped channels)."""

    def keep(c):
        local = np.abs(((c + 1.0) % 1.0) - 0.5)   # distance to cell center
        near = local < 0.27
        return near.sum(axis=1) >= 2

    return _filtered_cube(m, keep)


MESH_GENERATORS = {
    "Cube": lambda: _cube_mesh(4),
    "Simplex": lambda: _simplex_mesh(),
    "HyperBall": lambda: _ball_mesh(4),
    "HyperBallBalanced": lambda: _ball_mesh(6),
    "Cylinder": lambda: _cylinder_mesh(4),
    "Cheese": lambda: _cheese_mesh(8),
    "Torus": lambda: _torus_mesh(12, 4),
    "PlateWithHole": lambda: _plate_with_hole_mesh(8),
    "ReplicateCross": lambda: _replicate_cross_mesh(8),
    "ReplicateHoles": lambda: _replicate_holes_mesh(6),
}


def _keast_degree5():
    """Keast 14-point degree-5 rule on the reference tet.

    Returns (barycentric coords (14, 4), weights (14,) summing to 1)."""
    a = 0.31088591926330050
    b = 0.09273525031089123
    c = 0.04550370412564965
    wa = 0.11268792571801585
    wb = 0.07349304311636196
    wc = 0.04254602077708147
    pts, w = [], []
    for (lam, wt) in ((a, wa), (b, wb)):
        rest = 1.0 - 3.0 * lam
        for i in range(4):
            p = [lam] * 4
            p[i] = rest
            pts.append(p)
            w.append(wt)
    half = 0.5 - c
    import itertools as it

    seen = set()
    for perm in it.permutations([c, c, half, half]):
        if perm not in seen:
            seen.add(perm)
            pts.append(list(perm))
            w.append(wc)
    pts = np.asarray(pts)
    w = np.asarray(w)
    assert pts.shape == (14, 4) and abs(w.sum() - 1.0) < 1e-12
    return pts, w


# ---------------------------------------------------------------------------
# problem
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class UnstructuredDiffusion:
    mesh: str = "Cube"
    refinements: int = 1
    sol_id: int = 0
    freq: float = np.pi
    seed: int = 0
    max_diffusion: float = 3.0
    degree: int = 1             # P1 | P2 | P3 Lagrange tets (datagen.py:22)
    # the reference's four DoFRenumbering options (main.cpp:179-194):
    # subdomain_wise / Cuthill_McKee / king_ordering / boost::Cuthill_McKee
    renumbering: str = "none"   # none | cuthill_mckee | boost_cuthill_mckee
    #                           # | king_ordering | subdomain_wise
    n_subdomains: int = 1       # subdomain_wise partition count (the
    #                           # reference runs 1 MPI rank ⇒ identity)

    def __post_init__(self):
        if self.mesh not in MESH_GENERATORS:
            raise ValueError(
                f"unknown mesh {self.mesh!r}; one of {list(MESH_GENERATORS)}")
        base = MESH_GENERATORS[self.mesh]()
        self.n_base_cells = base.n_cells
        m = base
        for _ in range(self.refinements):
            m = refine(m)
        self._mesh = m
        rng = np.random.default_rng(self.seed)
        self.eps = rng.uniform(0.0, self.max_diffusion, self.n_base_cells)
        self._perm = None

    @property
    def tet_mesh(self) -> TetMesh:
        return self._mesh

    @property
    def ndof(self):
        if getattr(self, "_dof_map", None) is None:
            from .tet_elements import DofMap

            self._dof_map = DofMap(self._mesh, self.degree)
        return self._dof_map.ndof

    def mu_cells(self):
        """μ = 10^ε of the base-mesh ancestor (main.cpp:245-248 lookup)."""
        return 10.0 ** self.eps[self._mesh.base_cell]

    def exact(self) -> TensorSolution:
        return TensorSolution(self.sol_id, self.freq)

    def _permutation(self, a: CSR, dof_coords=None):
        """perm[new] = old for the chosen DoF renumbering
        (main.cpp:179-194 menu)."""
        if self.renumbering == "none":
            return None
        if self.renumbering in ("cuthill_mckee", "boost_cuthill_mckee"):
            import scipy.sparse as sp
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            g = sp.csr_matrix((np.ones_like(a.data), a.indices, a.indptr),
                              shape=a.shape)
            rcm = np.asarray(reverse_cuthill_mckee(g, symmetric_mode=True))
            # deal.II Cuthill_McKee = forward CM; boost::Cuthill_McKee
            # reverses — both reduce bandwidth identically, the orders are
            # mirror images
            return rcm if self.renumbering == "cuthill_mckee" else rcm[::-1]
        if self.renumbering == "king_ordering":
            return king_ordering(a)
        if self.renumbering == "subdomain_wise":
            if self.n_subdomains <= 1 or dof_coords is None:
                return None     # 1 rank ⇒ identity (the reference's case)
            return subdomain_wise_ordering(dof_coords, self.n_subdomains)
        raise ValueError(f"unknown renumbering {self.renumbering!r}")

    def build(self, eliminate_columns: bool = True):
        from .tet_elements import DofMap, assemble_load, assemble_stiffness

        mesh = self._mesh
        dm = DofMap(mesh, self.degree)
        self._dof_map = dm
        rows, cols, vals = assemble_stiffness(mesh, dm, self.mu_cells())
        a = CSR.from_coo(rows, cols, vals, (dm.ndof, dm.ndof))

        # RHS: NO μ in the integrand (tc1 parity, main.cpp:261-263)
        ex = self.exact()
        b = assemble_load(mesh, dm, ex.rhs)

        bidx = dm.boundary
        bvals = ex.value(dm.coords[bidx])
        a, b, x0 = apply_dirichlet(a, b, bidx, bvals,
                                   eliminate_columns=eliminate_columns)

        perm = self._permutation(a, dm.coords)
        if perm is not None:
            inv = np.empty_like(perm)
            inv[perm] = np.arange(perm.size)
            rows, cols, vals = a.row_expand()
            a = CSR.from_coo(inv[rows], inv[cols], vals, a.shape)
            b = b[perm]
            x0 = x0[perm]
            self._perm = perm
        return a, b, x0

    def compute_l2_error(self, u: np.ndarray) -> float:
        """L2 error by the degree-5 Keast 14-point rule — a degree-2 rule
        cannot measure an O(h²) error functional (its quadrature error is
        the same order as the quantity itself)."""
        from .tet_elements import l2_error

        if self._perm is not None:
            # solution is in renumbered ordering; map back to dof order:
            # new = inv[old] in build(), so u_dof = u[inv]
            inv = np.empty_like(self._perm)
            inv[self._perm] = np.arange(self._perm.size)
            u = u[inv]
        return l2_error(self._mesh, self._dof_map, u, self.exact().value)


def king_ordering(a: CSR) -> np.ndarray:
    """King ordering (boost::king_ordering analog, main.cpp:187-189):
    BFS from a minimum-degree start; at every step number the frontier
    vertex that introduces the fewest NEW frontier vertices (King's
    wavefront-minimizing variant of Cuthill–McKee)."""
    from collections import deque

    n = a.nrows
    indptr, indices = a.indptr, a.indices
    deg = np.diff(indptr)
    # Cuthill–McKee level traversal, but each vertex's unvisited neighbors
    # are appended sorted by DYNAMIC out-degree (remaining unvisited
    # neighbors) instead of static degree — boost's king variant.
    outdeg = deg.astype(np.int64).copy()
    visited = np.zeros(n, dtype=bool)
    perm = np.empty(n, dtype=np.int64)
    pos = 0

    def visit(u):
        visited[u] = True
        for w in indices[indptr[u]: indptr[u + 1]]:
            outdeg[w] -= 1

    for comp_start in np.argsort(deg, kind="stable"):
        if visited[comp_start]:
            continue
        visit(int(comp_start))
        queue = deque([int(comp_start)])
        while queue:
            v = queue.popleft()
            perm[pos] = v
            pos += 1
            nbrs = [int(u) for u in indices[indptr[v]: indptr[v + 1]]
                    if not visited[u]]
            nbrs.sort(key=lambda u: int(outdeg[u]))
            for u in nbrs:
                visit(u)
                queue.append(u)
    assert pos == n
    return perm


def subdomain_wise_ordering(coords: np.ndarray,
                            n_subdomains: int) -> np.ndarray:
    """DoFRenumbering::subdomain_wise analog: number dofs subdomain by
    subdomain. Subdomains come from recursive coordinate bisection of the
    dof cloud (the partition_triangulation stand-in; the reference runs a
    single rank, where this is the identity)."""
    n = coords.shape[0]
    part = np.zeros(n, dtype=np.int64)

    def split(idx, k, depth):
        if k <= 1 or idx.size == 0:
            return
        ax = depth % 3
        order = idx[np.argsort(coords[idx, ax], kind="stable")]
        k_lo = k // 2
        cut = idx.size * k_lo // k
        part[order[cut:]] += k_lo
        split(order[:cut], k_lo, depth + 1)
        split(order[cut:], k - k_lo, depth + 1)

    split(np.arange(n), n_subdomains, 0)
    return np.argsort(part, kind="stable")
