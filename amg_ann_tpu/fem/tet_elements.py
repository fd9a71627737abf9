"""P1/P2/P3 Lagrange tetrahedral elements (tc1 parity: degrees 1–3).

The reference sweeps FE_Q degree ∈ {1,2,3} on its unstructured meshes
(testcase1-diffusion-unstructured/datagen.py:22); this module supplies the
matching simplex family. Everything is affine-exact: with constant μ per
cell and straight tets, the stiffness entry is

    K_e[i,j] = μ_t |T_t| Σ_{a,b} C[i,j,a,b] (∇λ_a · ∇λ_b)_t

where C[i,j,a,b] = Σ_q w_q ∂φ_i/∂λ_a ∂φ_j/∂λ_b is a CONSTANT
reference-element tensor (quadrature of degree ≥ 2(p−1) makes it exact) —
assembly over the whole mesh is a single einsum against the per-tet ∇λ
Gram matrices, no per-quadrature-point loops.

DoF layout (orientation-consistent across cells):
  * P1: vertices;
  * P2: vertices + one dof per unique edge (midpoint node);
  * P3: vertices + two dofs per edge (at 1/3 and 2/3; side 0 is the one
    nearer the globally-smaller endpoint) + one per face (centroid).
"""

from __future__ import annotations

import itertools

import numpy as np

EDGE_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
FACE_TRIS = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))


# ---------------------------------------------------------------------------
# quadrature on the reference tet (barycentric)
# ---------------------------------------------------------------------------
def quad_degree2():
    """4-point degree-2 rule."""
    alpha, beta = 0.5854101966249685, 0.1381966011250105
    qp = np.full((4, 4), beta)
    np.fill_diagonal(qp, alpha)
    return qp, np.full(4, 0.25)


def quad_degree5():
    """Keast 14-point degree-5 rule; weights sum to 1."""
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
    seen = set()
    for perm in itertools.permutations([c, c, half, half]):
        if perm not in seen:
            seen.add(perm)
            pts.append(list(perm))
            w.append(wc)
    pts, w = np.asarray(pts), np.asarray(w)
    assert pts.shape == (14, 4) and abs(w.sum() - 1.0) < 1e-12
    return pts, w


# ---------------------------------------------------------------------------
# Lagrange bases in barycentric coordinates: values + ∂/∂λ
# ---------------------------------------------------------------------------
def p1_basis(l):
    nq = l.shape[0]
    vals = l.copy()
    dlam = np.broadcast_to(np.eye(4), (nq, 4, 4)).copy()
    return vals, dlam


def p2_basis(l):
    nq = l.shape[0]
    vals = np.empty((nq, 10))
    dlam = np.zeros((nq, 10, 4))
    for i in range(4):
        vals[:, i] = l[:, i] * (2 * l[:, i] - 1)
        dlam[:, i, i] = 4 * l[:, i] - 1
    for k, (i, j) in enumerate(EDGE_PAIRS):
        vals[:, 4 + k] = 4 * l[:, i] * l[:, j]
        dlam[:, 4 + k, i] = 4 * l[:, j]
        dlam[:, 4 + k, j] = 4 * l[:, i]
    return vals, dlam


def p3_basis(l):
    """20 dofs: 4 vertex + 12 edge (local side 0 = near the FIRST local
    endpoint of EDGE_PAIRS[k]) + 4 face."""
    nq = l.shape[0]
    vals = np.empty((nq, 20))
    dlam = np.zeros((nq, 20, 4))
    for i in range(4):
        li = l[:, i]
        vals[:, i] = 0.5 * li * (3 * li - 1) * (3 * li - 2)
        dlam[:, i, i] = 0.5 * (27 * li * li - 18 * li + 2)
    for k, (i, j) in enumerate(EDGE_PAIRS):
        li, lj = l[:, i], l[:, j]
        # node at 2/3 toward i (φ = 9/2 λi λj (3λi − 1))
        vals[:, 4 + 2 * k] = 4.5 * li * lj * (3 * li - 1)
        dlam[:, 4 + 2 * k, i] = 4.5 * lj * (6 * li - 1)
        dlam[:, 4 + 2 * k, j] = 4.5 * li * (3 * li - 1)
        # node at 2/3 toward j
        vals[:, 4 + 2 * k + 1] = 4.5 * li * lj * (3 * lj - 1)
        dlam[:, 4 + 2 * k + 1, j] = 4.5 * li * (6 * lj - 1)
        dlam[:, 4 + 2 * k + 1, i] = 4.5 * lj * (3 * lj - 1)
    for f, (i, j, k) in enumerate(FACE_TRIS):
        li, lj, lk = l[:, i], l[:, j], l[:, k]
        vals[:, 16 + f] = 27 * li * lj * lk
        dlam[:, 16 + f, i] = 27 * lj * lk
        dlam[:, 16 + f, j] = 27 * li * lk
        dlam[:, 16 + f, k] = 27 * li * lj
    return vals, dlam


BASIS = {1: p1_basis, 2: p2_basis, 3: p3_basis}
STIFF_RULE = {1: quad_degree2, 2: quad_degree2, 3: quad_degree5}


# ---------------------------------------------------------------------------
# mesh topology → global dof maps
# ---------------------------------------------------------------------------
def mesh_edges(tets):
    """(edges (ne, 2) with sorted endpoints, tet_edge (nt, 6) edge ids,
    flipped (nt, 6) True where the local pair is descending globally)."""
    pairs = np.stack([tets[:, list(p)] for p in EDGE_PAIRS], axis=1)
    flipped = pairs[:, :, 0] > pairs[:, :, 1]
    pairs_sorted = np.sort(pairs, axis=2).reshape(-1, 2)
    edges, inv = np.unique(pairs_sorted, axis=0, return_inverse=True)
    return edges, inv.reshape(tets.shape[0], 6), flipped


def mesh_faces(tets):
    tris = np.stack([tets[:, list(f)] for f in FACE_TRIS], axis=1)
    tris_sorted = np.sort(tris, axis=2).reshape(-1, 3)
    faces, inv, counts = np.unique(tris_sorted, axis=0,
                                   return_inverse=True, return_counts=True)
    return faces, inv.reshape(tets.shape[0], 4), counts


class DofMap:
    """Global dof enumeration + coordinates + boundary set for degree p."""

    def __init__(self, mesh, degree: int):
        assert degree in (1, 2, 3), degree
        self.degree = degree
        t = mesh.tets
        nv = mesh.n_vertices
        verts = mesh.vertices
        faces, tet_face, counts = mesh_faces(t)
        bface_mask = counts == 1
        bverts = np.unique(faces[bface_mask])

        if degree == 1:
            self.cell_dofs = t.copy()
            self.ndof = nv
            self.coords = verts.copy()
            self.boundary = bverts
            return

        edges, tet_edge, flipped = mesh_edges(t)
        ne = edges.shape[0]
        # boundary edges: the three edges of each boundary face
        bfaces = faces[bface_mask]
        bedge_pairs = np.sort(np.concatenate([
            bfaces[:, [0, 1]], bfaces[:, [0, 2]], bfaces[:, [1, 2]]]),
            axis=1)
        # locate them among the unique edges (edges are lexsorted rows)
        def find_rows(sub, table):
            ids = (table[:, 0].astype(np.int64) * (table.max() + 1)
                   + table[:, 1])
            sids = (sub[:, 0].astype(np.int64) * (table.max() + 1)
                    + sub[:, 1])
            order = np.argsort(ids)
            pos = np.searchsorted(ids[order], sids)
            return order[pos]

        bedges = np.unique(find_rows(bedge_pairs, edges))

        if degree == 2:
            self.ndof = nv + ne
            self.cell_dofs = np.concatenate([t, nv + tet_edge], axis=1)
            self.coords = np.concatenate(
                [verts, 0.5 * (verts[edges[:, 0]] + verts[edges[:, 1]])])
            self.boundary = np.concatenate([bverts, nv + bedges])
            return

        nf = faces.shape[0]
        # P3: edge dof (e, side): side 0 nearer the globally smaller
        # endpoint. Local side 0 is near the first LOCAL endpoint; where
        # the local pair is flipped, swap.
        e_base = nv + 2 * tet_edge               # (nt, 6)
        side0 = e_base + np.where(flipped, 1, 0)
        side1 = e_base + np.where(flipped, 0, 1)
        edofs = np.stack([side0, side1], axis=2).reshape(-1, 12)
        self.cell_dofs = np.concatenate(
            [t, edofs, nv + 2 * ne + tet_face], axis=1)
        self.ndof = nv + 2 * ne + nf
        va, vb = verts[edges[:, 0]], verts[edges[:, 1]]
        ecoords = np.stack([(2 * va + vb) / 3.0, (va + 2 * vb) / 3.0],
                           axis=1).reshape(-1, 3)
        fcoords = verts[faces].mean(axis=1)
        self.coords = np.concatenate([verts, ecoords, fcoords])
        bface_ids = np.flatnonzero(bface_mask)
        self.boundary = np.concatenate([
            bverts,
            (nv + 2 * bedges[:, None] + np.array([0, 1])).reshape(-1),
            nv + 2 * ne + bface_ids,
        ])


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------
def stiffness_tensor(degree: int) -> np.ndarray:
    """C[i,j,a,b] = Σ_q w_q ∂φ_i/∂λ_a ∂φ_j/∂λ_b (reference element)."""
    qp, qw = STIFF_RULE[degree]()
    _, dlam = BASIS[degree](qp)
    return np.einsum("q,qia,qjb->ijab", qw, dlam, dlam)


def assemble_stiffness(mesh, dof_map: DofMap, mu_cells: np.ndarray):
    """COO triplets (rows, cols, vals) of the diffusion stiffness matrix."""
    v = mesh.vertices[mesh.tets]
    d = v[:, 1:] - v[:, :1]
    vol = np.abs(np.linalg.det(d)) / 6.0
    g123 = np.linalg.inv(np.swapaxes(d, 1, 2))
    g0 = -g123.sum(axis=1, keepdims=True)
    grads = np.concatenate([g0, g123], axis=1)          # (nt, 4, 3)
    gram = np.einsum("tad,tbd->tab", grads, grads)      # (nt, 4, 4)
    c = stiffness_tensor(dof_map.degree)
    ke = np.einsum("ijab,tab->tij", c, gram)
    ke *= (mu_cells * vol)[:, None, None]
    cd = dof_map.cell_dofs
    nd = cd.shape[1]
    rows = np.repeat(cd, nd, axis=1).reshape(-1)
    cols = np.tile(cd, (1, nd)).reshape(-1)
    return rows, cols, ke.reshape(-1)


def assemble_load(mesh, dof_map: DofMap, f_fn):
    """Load vector ∫ f φ_i with the degree-5 rule (NO μ — tc1 parity,
    testcase1-…/src/main.cpp:261-263)."""
    v = mesh.vertices[mesh.tets]
    vol = mesh.volumes()
    qp, qw = quad_degree5()
    vals, _ = BASIS[dof_map.degree](qp)                 # (nq, nd)
    pts = np.einsum("qa,tad->tqd", qp, v)
    f = f_fn(pts)                                       # (nt, nq)
    be = np.einsum("tq,q,qi->ti", f, qw, vals) * vol[:, None]
    b = np.zeros(dof_map.ndof)
    np.add.at(b, dof_map.cell_dofs.reshape(-1), be.reshape(-1))
    return b


def l2_error(mesh, dof_map: DofMap, u: np.ndarray, exact_fn) -> float:
    v = mesh.vertices[mesh.tets]
    vol = mesh.volumes()
    qp, qw = quad_degree5()
    vals, _ = BASIS[dof_map.degree](qp)
    pts = np.einsum("qa,tad->tqd", qp, v)
    u_ex = exact_fn(pts)
    u_h = np.einsum("qi,ti->tq", vals, u[dof_map.cell_dofs])
    return float(np.sqrt(np.sum((u_h - u_ex) ** 2
                                * vol[:, None] * qw[None, :])))
