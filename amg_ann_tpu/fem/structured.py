"""Structured-grid Q_p FEM for the jumping-coefficient diffusion problem.

Re-implements the reference's testcase2 (paper's main case,
testcase2-diffusion-structured/src/main.cpp): diffusion −∇·(μ∇u) = μ·f on
[-1,1]^3, the cube subdivided into pattern_size macro-cells per axis
(`GridGenerator::subdivided_hyper_cube`, main.cpp:423-425) then refined
`ref` times; μ = 10^ε piecewise constant on the macro pattern with mode ∈
{1,2,3} = planes/lines/cells (DiffusionCoef indicator, main.cpp:101-113);
manufactured tensor-product exact solution with frequency π/h_macro
(main.cpp:80-87); Dirichlet BC = exact solution interpolated on ∂Ω.

TPU-first design: everything is tensor-factorized. One reference element
stiffness K̂ (Kronecker sum of 1-D mass/stiffness) serves every cell —
assembly is a broadcast μ_e·h·K̂ + scatter; the RHS and error integrals
factor into per-axis 1-D quadratures contracted by einsum. No per-cell
loops anywhere.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sparse.csr import CSR
from .bc import apply_dirichlet
from .quadrature import gauss_1d, lagrange_eval, mass_stiffness_1d
from .solutions import SOLUTIONS, TensorSolution, get_sol_id


@dataclasses.dataclass
class StructuredDiffusion:
    """Problem definition (the reference's Settings analog for tc2)."""

    pattern_size: int
    refinements: int
    degree: int = 1
    mode: int = 3
    epsv: np.ndarray | None = None  # pattern_size**mode exponents; None = all 0
    dim: int = 3  # only 3 supported (reference compiles the 2-D branch out)

    def __post_init__(self):
        if self.dim != 3:
            raise NotImplementedError("dim=3 only")
        if not (1 <= self.mode <= 3):
            raise ValueError(f"mode must be 1..3, got {self.mode}")
        n_eps = self.pattern_size ** self.mode
        if self.epsv is None:
            self.epsv = np.zeros(n_eps)
        self.epsv = np.asarray(self.epsv, dtype=np.float64)
        if self.epsv.size != n_eps:
            raise ValueError(
                f"epsv size {self.epsv.size} != pattern_size^mode = {n_eps}")

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
        return self.n_nodes_1d ** 3

    @property
    def sol_id(self) -> int:
        return get_sol_id(self.pattern_size)

    @property
    def freq(self) -> float:
        return np.pi * self.pattern_size / 2.0  # π / h_macro

    def exact(self) -> TensorSolution:
        return TensorSolution(self.sol_id, self.freq)

    def node_coords_1d(self) -> np.ndarray:
        return -1.0 + 2.0 * np.arange(self.n_nodes_1d) / (self.n_nodes_1d - 1)

    # -- coefficient field -------------------------------------------------
    def mu_cells(self) -> np.ndarray:
        """(ncell, ncell, ncell) per-fine-cell μ from the macro pattern.

        Index convention: mu[cx, cy, cz] with axis order (x, y, z); the
        reference indicator is Σ_{i<mode} macro_i · ps^i (main.cpp:104-107).
        """
        ps = self.pattern_size
        macro = np.arange(self.ncell) // 2 ** self.refinements
        ind = np.zeros((self.ncell,) * 3, dtype=np.int64)
        for i in range(self.mode):
            shape = [1, 1, 1]
            shape[i] = -1
            ind += macro.reshape(shape) * ps ** i
        return 10.0 ** self.epsv[ind]

    # -- node numbering ----------------------------------------------------
    def _gid(self, gx, gy, gz):
        n = self.n_nodes_1d
        return (gx * n + gy) * n + gz

    def _cell_dof_map(self):
        """(ncell³, (p+1)³) global dof ids per cell (row-major over cells
        and lexicographic (a,b,c) local ordering)."""
        p = self.degree
        nc = self.ncell
        c = np.arange(nc)
        a = np.arange(p + 1)
        g1 = p * c[:, None] + a[None, :]  # (nc, p+1) 1-D global node ids
        gx = g1[:, None, None, :, None, None]
        gy = g1[None, :, None, None, :, None]
        gz = g1[None, None, :, None, None, :]
        gid = self._gid(gx, gy, gz)  # (nc,nc,nc,p+1,p+1,p+1)
        return gid.reshape(nc ** 3, (p + 1) ** 3)

    # -- assembly ----------------------------------------------------------
    def reference_stiffness(self) -> np.ndarray:
        """K̂ on the unit cube: S⊗M⊗M + M⊗S⊗M + M⊗M⊗S (physical cell
        stiffness = μ_e · h · K̂, the h^{d-2} scaling in 3-D)."""
        p = self.degree
        M, S = mass_stiffness_1d(p)
        K = (np.einsum("ad,be,cf->abcdef", S, M, M)
             + np.einsum("ad,be,cf->abcdef", M, S, M)
             + np.einsum("ad,be,cf->abcdef", M, M, S))
        n = (p + 1) ** 3
        return K.reshape(n, n)

    def assemble_matrix(self) -> CSR:
        mu = self.mu_cells().reshape(-1)
        khat = self.reference_stiffness()
        gid = self._cell_dof_map()
        nloc = khat.shape[0]
        rows = np.repeat(gid, nloc, axis=1).reshape(-1)
        cols = np.tile(gid, (1, nloc)).reshape(-1)
        vals = (mu[:, None, None] * (self.h * khat)[None]).reshape(-1)
        return CSR.from_coo(rows, cols, vals, (self.ndof, self.ndof))

    def _axis_integrals(self, nq=None):
        """Per-cell 1-D integrals I_g[c, a] = ∫_cell g(x)·l_a dξ (unit
        measure; physical factor h applied by the caller) for g = f (value
        factor) and g = f″ (second-derivative factor)."""
        p = self.degree
        if nq is None:
            nq = p + 1
        xq, wq = gauss_1d(nq)
        V, _ = lagrange_eval(p, xq)
        f = SOLUTIONS[self.sol_id]
        c = np.arange(self.ncell)
        # physical coordinates of quad points in every 1-D cell: (nc, nq)
        x = -1.0 + self.h * (c[:, None] + xq[None, :])
        I0 = (f[0](x, self.freq) * wq) @ V.T  # (nc, p+1)
        I2 = (f[2](x, self.freq) * wq) @ V.T
        return I0, I2

    def assemble_rhs(self) -> np.ndarray:
        """b_i = ∫ μ(x)·(−Δu)(x)·φ_i — μ inside the integrand exactly as
        the reference (main.cpp:296-299)."""
        I0, I2 = self._axis_integrals()
        mu = self.mu_cells()
        # −Σ_axis ⊗-product, μ_e and h³ per cell
        t = (np.einsum("xa,yb,zc->xyzabc", I2, I0, I0)
             + np.einsum("xa,yb,zc->xyzabc", I0, I2, I0)
             + np.einsum("xa,yb,zc->xyzabc", I0, I0, I2))
        local = -(self.h ** 3) * mu[..., None, None, None] * t
        nloc = (self.degree + 1) ** 3
        gid = self._cell_dof_map().reshape(-1)
        b = np.zeros(self.ndof)
        np.add.at(b, gid, local.reshape(-1))
        return b

    def boundary_dofs(self):
        """(indices, values): all nodes on ∂Ω with the exact solution
        interpolated there (main.cpp:312-316)."""
        n = self.n_nodes_1d
        x = self.node_coords_1d()
        gx, gy, gz = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                                 indexing="ij")
        on_b = ((gx == 0) | (gx == n - 1) | (gy == 0) | (gy == n - 1)
                | (gz == 0) | (gz == n - 1))
        idx = self._gid(gx, gy, gz)[on_b]
        pts = np.stack([x[gx[on_b]], x[gy[on_b]], x[gz[on_b]]], axis=-1)
        return idx, self.exact().value(pts)

    def build(self, eliminate_columns: bool = True):
        """Assemble and constrain. Returns (A, b, x0)."""
        a = self.assemble_matrix()
        b = self.assemble_rhs()
        idx, vals = self.boundary_dofs()
        return apply_dirichlet(a, b, idx, vals,
                               eliminate_columns=eliminate_columns)

    # -- error norms (manufactured-solution oracle) ------------------------
    def compute_errors(self, u: np.ndarray, nq: int | None = None):
        """(L2, H1 seminorm, L∞) errors vs the exact solution, by
        tensor-product Gauss quadrature (L∞ sampled on the quad points of a
        denser rule, standing in for deal.II's QIterated trapezoid)."""
        p = self.degree
        if nq is None:
            nq = p + 2
        xq, wq = gauss_1d(nq)
        V, D = lagrange_eval(p, xq)
        nc = self.ncell
        u_loc = u[self._cell_dof_map()].reshape(nc, nc, nc, p + 1, p + 1,
                                                p + 1)
        # u_h and its physical gradient at all tensor quad points
        uh = np.einsum("xyzabc,aq,br,cs->xyzqrs", u_loc, V, V, V)
        s = 1.0 / self.h  # dξ/dx for ξ ∈ [0,1] over a cell of size h
        gx = s * np.einsum("xyzabc,aq,br,cs->xyzqrs", u_loc, D, V, V)
        gy = s * np.einsum("xyzabc,aq,br,cs->xyzqrs", u_loc, V, D, V)
        gz = s * np.einsum("xyzabc,aq,br,cs->xyzqrs", u_loc, V, V, D)

        c = np.arange(nc)
        x1 = -1.0 + self.h * (c[:, None] + xq[None, :])  # (nc, nq)
        ex = self.exact()
        f = ex.f
        fx0 = f[0](x1, ex.freq); fx1 = f[1](x1, ex.freq)
        u_ex = np.einsum("xq,yr,zs->xyzqrs", fx0, fx0, fx0)
        gex_x = np.einsum("xq,yr,zs->xyzqrs", fx1, fx0, fx0)
        gex_y = np.einsum("xq,yr,zs->xyzqrs", fx0, fx1, fx0)
        gex_z = np.einsum("xq,yr,zs->xyzqrs", fx0, fx0, fx1)

        w3 = np.einsum("q,r,s->qrs", wq, wq, wq) * self.h ** 3
        diff = uh - u_ex
        l2 = np.sqrt(np.einsum("xyzqrs,qrs->", diff ** 2, w3))
        h1 = np.sqrt(np.einsum("xyzqrs,qrs->",
                               (gx - gex_x) ** 2 + (gy - gex_y) ** 2
                               + (gz - gex_z) ** 2, w3))
        linf = np.abs(diff).max()
        return l2, h1, linf


def compute_order(errors):
    """Per-cycle log2 convergence orders (main.cpp:388-398)."""
    e = np.asarray(errors)
    return np.log2(e[:-1]) - np.log2(e[1:])
