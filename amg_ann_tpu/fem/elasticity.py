"""Vector-valued linear elasticity (testcase3 parity).

Re-implements testcase3-linear-elasticity/src/main.cpp: Q_p^3 displacement
FEM on [-1,1]^3 (subdivided into pattern_size macro-cells, refined), Lamé
fields from a Young-modulus pattern

    ε_k = 10^{U(0, max_young)}   (or sharp: 10^{max_young·[x < max_young/2]})
    μ = E_min·ε/(1+ν),  λ = μ·ν/(1−2ν),  ν = 0.29, E_min = 1000   (:48-49,88-109)

bilinear form (deal.II step-8 convention, :322-341):

    a(u,v) = ∫ λ ∂_{ci}φ_i ∂_{cj}φ_j + μ ∂_{cj}φ_i ∂_{ci}φ_j
             + δ_{ci,cj} μ ∇φ_i·∇φ_j

manufactured solution u_c(x) = (sin(πp·x)sin(πp·y)sin(πp·z))² for every
component (πp = π·pattern_size/2, :111-149), with the closed-form RHS of
:51-86. Dirichlet BC = exact solution on ∂Ω. DoF layout: interleaved
(node·3 + component).

TPU-first: the 3×3 block of reference gradient-product matrices
B̂_{cd} = ∫ ∂_c φ_i ∂_d φ_j is precomputed once from 1-D Kronecker factors;
per-cell matrices are μ,λ-scaled broadcasts of those blocks.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sparse.csr import CSR
from .bc import apply_dirichlet
from .quadrature import gauss_1d, lagrange_eval

POISSON_RATIO = 0.29
MIN_YOUNG = 1000.0


def make_epsv(seed: int, n: int, max_young: float, sharp: bool) -> np.ndarray:
    """ε pattern (already exponentiated, like the reference's m_epsv)."""
    x = np.random.default_rng(seed).uniform(0.0, max_young, size=n)
    if sharp:
        return 10.0 ** (max_young * (x < max_young / 2.0))
    return 10.0 ** x


@dataclasses.dataclass
class LinearElasticity:
    pattern_size: int
    refinements: int
    degree: int = 1
    mode: int = 3
    epsv: np.ndarray | None = None      # exponentiated values ε_k
    seed: int = 0
    max_young: float = 2.0
    sharp: bool = False

    def __post_init__(self):
        n_eps = self.pattern_size ** self.mode
        if self.epsv is None:
            self.epsv = make_epsv(self.seed, n_eps, self.max_young,
                                  self.sharp)
        self.epsv = np.asarray(self.epsv, dtype=np.float64)
        assert self.epsv.size == n_eps

    # -- geometry ----------------------------------------------------------
    @property
    def ncell(self) -> int:
        return self.pattern_size * 2 ** self.refinements

    @property
    def h(self) -> float:
        return 2.0 / self.ncell

    @property
    def n_nodes_1d(self) -> int:
        return self.degree * self.ncell + 1

    @property
    def ndof(self) -> int:
        return 3 * self.n_nodes_1d ** 3

    @property
    def freq(self) -> float:
        return np.pi * self.pattern_size / 2.0

    # -- material fields ---------------------------------------------------
    def mu_lambda_cells(self):
        ps = self.pattern_size
        macro = np.arange(self.ncell) // 2 ** self.refinements
        ind = np.zeros((self.ncell,) * 3, dtype=np.int64)
        for i in range(self.mode):
            shape = [1, 1, 1]
            shape[i] = -1
            ind += macro.reshape(shape) * ps ** i
        eps = self.epsv[ind]
        mu = MIN_YOUNG * eps / (1.0 + POISSON_RATIO)
        lam = mu * POISSON_RATIO / (1.0 - 2.0 * POISSON_RATIO)
        return mu, lam

    # -- exact solution / rhs ---------------------------------------------
    def exact_value(self, pts):
        """u_c(x) identical for every component c."""
        p = self.freq
        s = (np.sin(p * pts[..., 0]) * np.sin(p * pts[..., 1])
             * np.sin(p * pts[..., 2]))
        return s * s

    def rhs_value(self, pts, mu, lam):
        """(npts, 3) body force; mu/lam broadcastable to pts[..., 0]."""
        p = self.freq
        p2 = p * p
        out = np.empty(pts.shape[:-1] + (3,))
        for comp in range(3):
            x = pts[..., (0 + comp) % 3]
            y = pts[..., (1 + comp) % 3]
            z = pts[..., (2 + comp) % 3]
            siny = np.sin(p * y)
            sinz = np.sin(p * z)
            out[..., comp] = 2 * p2 * (
                -0.25 * lam * (np.cos(p * (-2 * x + y + z))
                               + np.cos(p * (2 * x - y + z))
                               + np.cos(p * (2 * x + y - z))
                               - 3 * np.cos(p * (2 * x + y + z)))
                * siny * sinz
                - mu * (np.sin(p * x) * siny * siny * np.sin(p * (x + 2 * z))
                        + np.sin(p * x) * sinz * sinz * np.sin(p * (x + 2 * y))
                        + 2 * siny * siny * sinz * sinz * np.cos(2 * p * x)))
        return out

    # -- reference gradient blocks -----------------------------------------
    def _bhat_blocks(self):
        """B̂[c,d] (nloc × nloc): ∫ ∂_c φ_i ∂_d φ_j on the unit cube."""
        p = self.degree
        xq, wq = gauss_1d(p + 1)
        V, D = lagrange_eval(p, xq)
        M = (V * wq) @ V.T
        S = (D * wq) @ D.T
        G = (D * wq) @ V.T          # ∫ l'_a l_b
        mats = {"M": M, "S": S, "G": G, "Gt": G.T}
        nloc = (p + 1) ** 3
        out = np.empty((3, 3, nloc, nloc))
        for c in range(3):
            for d in range(3):
                fac = []
                for ax in range(3):
                    if ax == c and ax == d:
                        fac.append(mats["S"])
                    elif ax == c:
                        fac.append(mats["G"])
                    elif ax == d:
                        fac.append(mats["Gt"])
                    else:
                        fac.append(mats["M"])
                out[c, d] = np.einsum("ad,be,cf->abcdef", *fac).reshape(
                    nloc, nloc)
        return out

    # -- dof maps ----------------------------------------------------------
    def _gid_scalar(self, gx, gy, gz):
        n = self.n_nodes_1d
        return (gx * n + gy) * n + gz

    def _cell_node_map(self):
        p = self.degree
        nc = self.ncell
        g1 = p * np.arange(nc)[:, None] + np.arange(p + 1)[None, :]
        gx = g1[:, None, None, :, None, None]
        gy = g1[None, :, None, None, :, None]
        gz = g1[None, None, :, None, None, :]
        return self._gid_scalar(gx, gy, gz).reshape(nc ** 3, (p + 1) ** 3)

    # -- assembly ----------------------------------------------------------
    def assemble_matrix(self) -> CSR:
        mu, lam = self.mu_lambda_cells()
        mu = mu.reshape(-1)
        lam = lam.reshape(-1)
        bhat = self._bhat_blocks()
        nloc = bhat.shape[2]
        tr = bhat[0, 0] + bhat[1, 1] + bhat[2, 2]

        nodes = self._cell_node_map()           # (ncells, nloc)
        ncells = nodes.shape[0]
        rows_l, cols_l, blocks = [], [], []
        for ci in range(3):
            for cj in range(3):
                # K_block = λ B[ci,cj] + μ B[cj,ci] + δ μ tr   (per cell,
                # scaled by h as in the scalar case)
                base = (lam[:, None, None] * bhat[ci, cj][None]
                        + mu[:, None, None] * bhat[cj, ci][None])
                if ci == cj:
                    base = base + mu[:, None, None] * tr[None]
                blocks.append(self.h * base)
                rows_l.append(3 * np.repeat(nodes, nloc, axis=1) + ci)
                cols_l.append(3 * np.tile(nodes, (1, nloc)) + cj)
        rows = np.concatenate([r.reshape(-1) for r in rows_l])
        cols = np.concatenate([c.reshape(-1) for c in cols_l])
        vals = np.concatenate([b.reshape(-1) for b in blocks])
        return CSR.from_coo(rows, cols, vals, (self.ndof, self.ndof))

    def assemble_rhs(self) -> np.ndarray:
        """b_{(i,c)} = ∫ φ_i f_c (quadrature per cell, vectorized)."""
        p = self.degree
        nq = p + 1
        xq, wq = gauss_1d(nq)
        V, _ = lagrange_eval(p, xq)
        nc = self.ncell
        c = np.arange(nc)
        x1 = -1.0 + self.h * (c[:, None] + xq[None, :])    # (nc, nq)
        mu, lam = self.mu_lambda_cells()

        # quadrature points of every cell: (ncx,ncy,ncz,qx,qy,qz,3)
        X = x1[:, None, None, :, None, None]
        Y = x1[None, :, None, None, :, None]
        Z = x1[None, None, :, None, None, :]
        pts = np.stack(np.broadcast_arrays(X, Y, Z), axis=-1)
        f = self.rhs_value(pts, mu[..., None, None, None],
                           lam[..., None, None, None])    # (...,qqq,3)

        w3 = np.einsum("q,r,s->qrs", wq, wq, wq) * self.h ** 3
        # local rhs: contract f (cells × quad × component) with the basis
        # values along each axis
        local = np.einsum("xyzqrsm,qrs,aq,br,es->xyzabem", f, w3, V, V, V)
        nloc = (p + 1) ** 3
        local = local.reshape(nc ** 3, nloc, 3)
        nodes = self._cell_node_map()
        b = np.zeros(self.ndof)
        for comp in range(3):
            np.add.at(b, (3 * nodes + comp).reshape(-1),
                      local[:, :, comp].reshape(-1))
        return b

    def boundary_dofs(self):
        n = self.n_nodes_1d
        x = -1.0 + 2.0 * np.arange(n) / (n - 1)
        gx, gy, gz = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
        on_b = ((gx == 0) | (gx == n - 1) | (gy == 0) | (gy == n - 1)
                | (gz == 0) | (gz == n - 1))
        node_idx = self._gid_scalar(gx, gy, gz)[on_b]
        pts = np.stack([x[gx[on_b]], x[gy[on_b]], x[gz[on_b]]], axis=-1)
        vals_scalar = self.exact_value(pts)
        idx = np.concatenate([3 * node_idx + c for c in range(3)])
        vals = np.concatenate([vals_scalar] * 3)
        return idx, vals

    def build(self, eliminate_columns: bool = True):
        a = self.assemble_matrix()
        b = self.assemble_rhs()
        idx, vals = self.boundary_dofs()
        return apply_dirichlet(a, b, idx, vals,
                               eliminate_columns=eliminate_columns)

    def compute_l2_error(self, u: np.ndarray, nq: int | None = None) -> float:
        """Σ_c ‖u_c − u_c^ex‖_{L²} combined (vector L2 norm)."""
        p = self.degree
        if nq is None:
            nq = p + 2
        xq, wq = gauss_1d(nq)
        V, _ = lagrange_eval(p, xq)
        nc = self.ncell
        nodes = self._cell_node_map()
        err2 = 0.0
        c1 = np.arange(nc)
        x1 = -1.0 + self.h * (c1[:, None] + xq[None, :])
        X = x1[:, None, None, :, None, None]
        Y = x1[None, :, None, None, :, None]
        Z = x1[None, None, :, None, None, :]
        pts = np.stack(np.broadcast_arrays(X, Y, Z), axis=-1)
        u_ex = self.exact_value(pts)
        w3 = np.einsum("q,r,s->qrs", wq, wq, wq) * self.h ** 3
        for comp in range(3):
            uc = u[3 * nodes + comp].reshape(
                nc, nc, nc, p + 1, p + 1, p + 1)
            uh = np.einsum("xyzabe,aq,br,es->xyzqrs", uc, V, V, V)
            err2 += np.einsum("xyzqrs,qrs->", (uh - u_ex) ** 2, w3)
        return float(np.sqrt(err2))
