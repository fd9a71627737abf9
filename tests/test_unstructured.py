"""testcase1 analog: unstructured P1 tet FEM on generated domains."""

import numpy as np
import pytest

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.fem.structured import compute_order
from amg_ann_tpu.fem.unstructured import (
    MESH_GENERATORS, TetMesh, UnstructuredDiffusion, refine,
)
from amg_ann_tpu.solvers import amg_solve


class TestMeshes:
    @pytest.mark.parametrize("name", list(MESH_GENERATORS))
    def test_generators_valid(self, name):
        m = MESH_GENERATORS[name]()
        assert m.n_cells > 0
        vols = m.volumes()
        assert np.all(vols > 1e-14), f"{name}: degenerate tets"
        assert m.tets.max() < m.n_vertices
        assert m.boundary_vertices().size > 0

    def test_refinement_preserves_volume(self):
        m = MESH_GENERATORS["Cube"]()
        total = m.volumes().sum()
        r = refine(m)
        assert r.n_cells == 8 * m.n_cells
        np.testing.assert_allclose(r.volumes().sum(), total, rtol=1e-12)
        # ancestor tracking
        assert set(np.unique(r.base_cell)) == set(np.unique(m.base_cell))

    def test_cube_volume_exact(self):
        m = MESH_GENERATORS["Cube"]()
        np.testing.assert_allclose(m.volumes().sum(), 8.0, rtol=1e-12)


class TestProblem:
    def test_convergence_on_cube(self):
        errs = []
        for ref in (0, 1, 2):
            p = UnstructuredDiffusion(mesh="Cube", refinements=ref,
                                      sol_id=0, freq=np.pi / 2,
                                      max_diffusion=0.0)
            a, b, x0 = p.build()
            x = np.linalg.solve(a.to_dense(), b)
            errs.append(p.compute_l2_error(x))
        orders = compute_order(errs)
        assert orders[-1] > 2 - 0.3, (errs, orders)

    def test_mu_respects_ancestors(self):
        p = UnstructuredDiffusion(mesh="Cube", refinements=2, seed=1,
                                  max_diffusion=5.0)
        mu = p.mu_cells()
        # constant within each base cell's descendants
        for bc in np.unique(p.tet_mesh.base_cell)[:5]:
            vals = mu[p.tet_mesh.base_cell == bc]
            assert np.all(vals == vals[0])
        assert len(np.unique(mu)) > 1

    def test_amg_solve_ball(self):
        p = UnstructuredDiffusion(mesh="HyperBall", refinements=2, seed=0,
                                  max_diffusion=2.0)
        a, b, x0 = p.build()
        res = amg_solve(a, b, AMGParams(), x0=x0, rtol=1e-8, tol=0.0)
        assert res.converged and res.niters <= 60, res.niters

    def test_renumbering_same_solution(self):
        p0 = UnstructuredDiffusion(mesh="Cube", refinements=1, seed=2,
                                   max_diffusion=1.0)
        p1 = UnstructuredDiffusion(mesh="Cube", refinements=1, seed=2,
                                   max_diffusion=1.0,
                                   renumbering="cuthill_mckee")
        a0, b0, _ = p0.build()
        a1, b1, _ = p1.build()
        x0 = np.linalg.solve(a0.to_dense(), b0)
        x1 = np.linalg.solve(a1.to_dense(), b1)
        np.testing.assert_allclose(p0.compute_l2_error(x0),
                                   p1.compute_l2_error(x1), rtol=1e-10)

    def test_torus_solves(self):
        p = UnstructuredDiffusion(mesh="Torus", refinements=1, seed=0,
                                  max_diffusion=1.0)
        a, b, x0 = p.build()
        res = amg_solve(a, b, AMGParams(), x0=x0, rtol=1e-8, tol=0.0)
        assert res.converged

    def test_unknown_mesh_rejected(self):
        with pytest.raises(ValueError):
            UnstructuredDiffusion(mesh="Klein")


def test_vtk_export(tmp_path):
    from amg_ann_tpu.fem.vtk import write_tet_vtk, write_structured_vtk

    p = UnstructuredDiffusion(mesh="Cube", refinements=0)
    u = np.zeros(p.ndof)
    f = tmp_path / "m.vtk"
    write_tet_vtk(str(f), p.tet_mesh, point_fields={"solution": u},
                  cell_fields={"mu": p.mu_cells()})
    txt = f.read_text()
    assert "UNSTRUCTURED_GRID" in txt and "CELL_DATA" in txt

    g = tmp_path / "s.vtk"
    x = np.linspace(-1, 1, 5)
    write_structured_vtk(str(g), (x, x, x),
                         {"solution": np.zeros(125)})
    assert "STRUCTURED_GRID" in g.read_text()


def test_describe_stats():
    from amg_ann_tpu.utils import describe

    s = describe(np.arange(101, dtype=float), printer=None)
    assert s["50%"] == 50.0 and s["count"] == 101


class TestHigherDegreeTets:
    """tc1 degree 2-3 parity (testcase1-…/datagen.py:22)."""

    def _solve(self, p):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        a, b, _ = p.build()
        A = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
        return spla.spsolve(A, b)

    @pytest.mark.parametrize("deg,expect", [(2, 2.5), (3, 3.4)])
    def test_convergence_order(self, deg, expect):
        errs = []
        for ref in (0, 1):
            p = UnstructuredDiffusion(mesh="Cube", refinements=ref,
                                      degree=deg, max_diffusion=0.0,
                                      sol_id=0, freq=np.pi)
            errs.append(p.compute_l2_error(self._solve(p)))
        rate = np.log2(errs[0] / errs[1])
        assert rate > expect, (errs, rate)

    def test_p2_dof_count(self):
        p = UnstructuredDiffusion(mesh="Cube", refinements=1, degree=2)
        from amg_ann_tpu.fem.tet_elements import DofMap, mesh_edges

        dm = DofMap(p.tet_mesh, 2)
        edges, _, _ = mesh_edges(p.tet_mesh.tets)
        assert dm.ndof == p.tet_mesh.n_vertices + edges.shape[0]

    def test_amg_solves_p2_matrix(self):
        from amg_ann_tpu.amg import AMGParams
        from amg_ann_tpu.solvers import amg_solve

        p = UnstructuredDiffusion(mesh="Cube", refinements=1, degree=2,
                                  seed=3)
        a, b, x0 = p.build()
        res = amg_solve(a, b, AMGParams(smoother="chebyshev"), x0=x0,
                        rtol=1e-8, tol=0.0, maxiter=300)
        assert res.converged


class TestRenumberings:
    """The reference's 4-option renumbering menu (main.cpp:179-194)."""

    @pytest.mark.parametrize("rn", ["king_ordering", "boost_cuthill_mckee",
                                    "cuthill_mckee", "subdomain_wise"])
    def test_solution_invariant(self, rn):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        base = UnstructuredDiffusion(mesh="Cube", refinements=1,
                                     max_diffusion=0.0, seed=1)
        a0, b0, _ = base.build()
        A0 = sp.csr_matrix((a0.data, a0.indices, a0.indptr), shape=a0.shape)
        e0 = base.compute_l2_error(spla.spsolve(A0, b0))
        p = UnstructuredDiffusion(mesh="Cube", refinements=1,
                                  max_diffusion=0.0, seed=1,
                                  renumbering=rn, n_subdomains=4)
        a, b, _ = p.build()
        A = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
        e = p.compute_l2_error(spla.spsolve(A, b))
        assert e == pytest.approx(e0, rel=1e-10)

    def test_king_is_permutation_and_reduces_bandwidth(self):
        from amg_ann_tpu.fem.unstructured import king_ordering

        p = UnstructuredDiffusion(mesh="Cube", refinements=1)
        a, _, _ = p.build()
        perm = king_ordering(a)
        assert np.array_equal(np.sort(perm), np.arange(a.nrows))
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        rows, cols, _ = a.row_expand()
        # King minimizes the wavefront: the MAX bandwidth must be a small
        # fraction of n (a random ordering is ~n; King keeps the frontier
        # compact so every edge stays within it)
        bw_king = int(np.abs(inv[rows] - inv[cols]).max())
        assert bw_king < a.nrows // 8, bw_king


def test_replicate_holes_mesh():
    """tc1 ReplicateHoles parity (main.cpp:311-313): 3×2×1 replicated
    cubes with cylindrical holes."""
    p = UnstructuredDiffusion(mesh="ReplicateHoles", refinements=0)
    a, b, x0 = p.build()
    assert a.nrows == p.ndof and p.ndof > 500
    m = p.tet_mesh
    # holes exist: no tet centroid inside any cylinder
    cent = m.vertices[m.tets].mean(axis=1)
    local = ((cent[:, :2] + 1.0) % 2.0) - 1.0
    assert np.linalg.norm(local, axis=1).min() > 0.35
    # spans the 3×2×1 replication
    assert m.vertices[:, 0].max() > 4.5 and m.vertices[:, 1].max() > 2.5
