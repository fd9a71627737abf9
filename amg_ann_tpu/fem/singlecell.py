"""Single-cell diffusion (testcase2.1): conditioning / spectrum study.

Re-implements testcase2.1-diffusion-singlecell/src/main.cpp: Poisson on
[-1,1]^3 globally refined `num_ref` times, μ = 10^diff on the ONE cell
containing `marked_point` and 1 elsewhere (:182-188), homogeneous Dirichlet
BC (:219-223), RHS f(p) = 2·f²·π²·Π_i sin(fπ p_i) with f = 2 (:49-58,
μ multiplying the integrand like tc2). Three solver modes: 0 = extremal
eigenvalues (SLEPc in the reference → native Lanczos here), 1 = θ sweep
0.05..0.95 step 0.0125, 2 = view only (:278-383).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sparse.csr import CSR
from .bc import apply_dirichlet
from .quadrature import gauss_1d, lagrange_eval, mass_stiffness_1d


@dataclasses.dataclass
class SingleCellDiffusion:
    num_ref: int
    diffusion_exp: float = 4.0
    marked_point: tuple = (0.0, 0.0, 0.0)
    degree: int = 1
    rhs_freq: float = 2.0  # the reference's constexpr f = 2.0

    @property
    def ncell(self) -> int:
        return 2 ** self.num_ref

    @property
    def h(self) -> float:
        return 2.0 / self.ncell

    @property
    def n_nodes_1d(self) -> int:
        return self.degree * self.ncell + 1

    @property
    def ndof(self) -> int:
        return self.n_nodes_1d ** 3

    def marked_cell(self):
        """(cx, cy, cz) of the cell containing marked_point."""
        out = []
        for d in range(3):
            c = int(np.floor((self.marked_point[d] + 1.0) / self.h))
            out.append(min(max(c, 0), self.ncell - 1))
        return tuple(out)

    def mu_cells(self) -> np.ndarray:
        mu = np.ones((self.ncell,) * 3)
        mu[self.marked_cell()] = 10.0 ** self.diffusion_exp
        return mu

    def _gid(self, gx, gy, gz):
        n = self.n_nodes_1d
        return (gx * n + gy) * n + gz

    def _cell_dof_map(self):
        p = self.degree
        nc = self.ncell
        g1 = p * np.arange(nc)[:, None] + np.arange(p + 1)[None, :]
        gx = g1[:, None, None, :, None, None]
        gy = g1[None, :, None, None, :, None]
        gz = g1[None, None, :, None, None, :]
        return self._gid(gx, gy, gz).reshape(nc ** 3, (p + 1) ** 3)

    def assemble_matrix(self) -> CSR:
        p = self.degree
        M, S = mass_stiffness_1d(p)
        khat = (np.einsum("ad,be,cf->abcdef", S, M, M)
                + np.einsum("ad,be,cf->abcdef", M, S, M)
                + np.einsum("ad,be,cf->abcdef", M, M, S))
        nloc = (p + 1) ** 3
        khat = khat.reshape(nloc, nloc)
        mu = self.mu_cells().reshape(-1)
        gid = self._cell_dof_map()
        rows = np.repeat(gid, nloc, axis=1).reshape(-1)
        cols = np.tile(gid, (1, nloc)).reshape(-1)
        vals = (mu[:, None, None] * (self.h * khat)[None]).reshape(-1)
        return CSR.from_coo(rows, cols, vals, (self.ndof, self.ndof))

    def assemble_rhs(self) -> np.ndarray:
        """b_i = ∫ μ·2f²π²·Π sin(fπ x_d)·φ_i (tensor-factorized)."""
        p = self.degree
        f = self.rhs_freq
        xq, wq = gauss_1d(p + 1)
        V, _ = lagrange_eval(p, xq)
        c = np.arange(self.ncell)
        x = -1.0 + self.h * (c[:, None] + xq[None, :])
        I_sin = (np.sin(f * np.pi * x) * wq) @ V.T    # (nc, p+1)
        t = np.einsum("xa,yb,zc->xyzabc", I_sin, I_sin, I_sin)
        mu = self.mu_cells()
        amp = 2.0 * f * f * np.pi * np.pi
        local = amp * (self.h ** 3) * mu[..., None, None, None] * t
        b = np.zeros(self.ndof)
        np.add.at(b, self._cell_dof_map().reshape(-1), local.reshape(-1))
        return b

    def boundary_dofs(self):
        n = self.n_nodes_1d
        gx, gy, gz = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
        on_b = ((gx == 0) | (gx == n - 1) | (gy == 0) | (gy == n - 1)
                | (gz == 0) | (gz == n - 1))
        idx = self._gid(gx, gy, gz)[on_b]
        return idx, np.zeros(idx.size)  # homogeneous Dirichlet

    def build(self, eliminate_columns: bool = True):
        a = self.assemble_matrix()
        b = self.assemble_rhs()
        idx, vals = self.boundary_dofs()
        return apply_dirichlet(a, b, idx, vals,
                               eliminate_columns=eliminate_columns)
