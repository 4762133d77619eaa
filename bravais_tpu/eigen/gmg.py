"""Geometric multigrid preconditioner for the Bloch H1 operators.

SURVEY.md App. C.4 — the rebuild's replacement for hypre BoomerAMG
(§2.2 #11), exploiting the structured periodic grid where geometric MG
is natural and superior to AMG:

* hierarchy: p-coarsen p → 1 (embedded nodal interpolation), then
  h-coarsen n → n/2 while n is even (GLL p=1 nodes at n coincide with
  corner+midpoint nodes of n/2 elements, so both transfers are the same
  per-element tensor contraction);
* smoother: Chebyshev(ν) on the diagonally-scaled operator, with
  host-precomputed λ_max bounds per level (power iteration on the f64
  NumPy twin — one-time setup);
* coarsest level: Chebyshev-damped richardson sweeps (small enough that
  a handful of iterations is exact-ish);
* everything k-dependent enters through traced scalars only — ONE
  compiled V-cycle serves all k-points (§7.2 item 5).

Operators at every level are rediscretizations (the coefficient callable
is resampled on the level's quadrature grid).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.helmholtz import BlochHelmholtz, CoefLike
from bravais_tpu.spaces import tensor
from bravais_tpu.spaces.basis1d import lagrange_eval
from bravais_tpu.spaces.h1 import H1Space

__all__ = ["GMG"]


def _prolong_table(fine_nodes: np.ndarray) -> np.ndarray:
    """(n_fine_local, 2): p=1 hat values at the fine element-local nodes
    (the last, shared node dropped)."""
    B, _ = lagrange_eval(np.array([0.0, 1.0]), fine_nodes[:-1])
    return B


class _Level:
    def __init__(self, op: BlochHelmholtz, lmax: float):
        self.op = op
        self.lmax = lmax


class GMG:
    """V-cycle preconditioner factory for ``H1Space`` Bloch operators.

    Usage::

        gmg = GMG(space, alpha=..., beta=..., dtype=...)
        precond = gmg.precond(k)          # block preconditioner for k
        # or BandSweep(..., precond=gmg.precond)
    """

    def __init__(self, space: H1Space, alpha: CoefLike = 1.0,
                 beta: CoefLike = 1.0, dtype=jnp.complex64,
                 nu: int = 3, coarse_sweeps: int = 8,
                 min_coarse: int = 2, fine_op: Optional[BlochHelmholtz]
                 = None):
        self.nu = nu
        self.coarse_sweeps = coarse_sweeps
        lat = space.grid.lattice

        # Build the space hierarchy: (n, p) -> (n, 1) -> (n/2, 1) -> ...
        specs = [(space.grid.shape, space.p)]
        if space.p > 1:
            specs.append((space.grid.shape, 1))
        n = np.asarray(space.grid.shape)
        while np.all(n % 2 == 0) and np.all(n // 2 >= min_coarse):
            n = n // 2
            specs.append((tuple(int(x) for x in n), 1))

        self.levels: List[_Level] = []
        for i, (shape, p) in enumerate(specs):
            if i == 0 and fine_op is not None:
                op = fine_op
            else:
                sp = H1Space.make(PeriodicGrid.make(lat, shape), p,
                                  max(p + 2, 3))
                op = BlochHelmholtz(sp, alpha=alpha, beta=beta, dtype=dtype)
            self.levels.append(_Level(op, self._lmax_host(op)))

        # Transfer tables: level i -> i+1 (fine -> coarse is the same
        # table transposed). Table shape: (fine locals per coarse elem, 2).
        self._ptabs = []
        for i in range(len(self.levels) - 1):
            fine = self.levels[i].op.space
            coarse = self.levels[i + 1].op.space
            if fine.grid.shape == coarse.grid.shape:   # p -> 1
                tab = _prolong_table(fine.basis.nodes)
            else:                                       # h -> h/2 (p=1)
                tab = _prolong_table(np.array([0.0, 0.5, 1.0]))
            self._ptabs.append(tab.astype(np.dtype(op.rdtype)))

    @staticmethod
    def _lmax_host(op: BlochHelmholtz, iters: int = 30) -> float:
        """Host power-iteration bound for λ_max(D⁻¹ A(0)) (f64 twin).
        The |k|² part scales the same way in A and D, so one k=0 bound
        (plus margin) covers the Brillouin zone."""
        sp = op.space
        rng = np.random.default_rng(11)
        v = rng.standard_normal(sp.dof_shape) \
            + 1j * rng.standard_normal(sp.dof_shape)
        d = np.maximum(np.asarray(op.diag0, np.float64), 1e-30)
        k0 = np.zeros(sp.dim)
        lam = 1.0
        for _ in range(iters):
            w = op.apply_A_np(v, k0) / d
            lam = float(np.linalg.norm(w.ravel()) / np.linalg.norm(v.ravel()))
            v = w / np.linalg.norm(w.ravel())
        return 1.25 * lam

    # -- transfers ------------------------------------------------------

    def _prolong(self, i: int, u, k=None):
        """coarse level i+1 -> fine level i (values: assign semantics)."""
        fine = self.levels[i].op.space
        coarse = self.levels[i + 1].op.space
        d = fine.dim
        tab = jnp.asarray(self._ptabs[i])
        ue = tensor.gather(u, coarse.grid.shape, (coarse.p,) * d,
                           (True,) * d)
        ue = tensor.contract(ue, [tab] * d)   # fine locals per coarse elem
        # Locals are the element's fine nodes with the shared node dropped
        # -> plain reshape reassembles the fine global array.
        shp = []
        for n in coarse.grid.shape:
            shp.extend([n, tab.shape[0]])
        ue = ue.reshape(shp)
        out_shape = fine.dof_shape
        for ax in range(d):
            ue = ue.reshape(*ue.shape[:ax], out_shape[ax],
                            *ue.shape[ax + 2:])
        return ue

    def _restrict(self, i: int, r, k=None):
        """fine level i -> coarse level i+1 (residuals: adjoint)."""
        fine = self.levels[i].op.space
        coarse = self.levels[i + 1].op.space
        d = fine.dim
        tab = jnp.asarray(self._ptabs[i])
        nf = tab.shape[0]
        for ax in range(d):
            pos = 2 * ax  # axes before this one are already split
            r = r.reshape(*r.shape[:pos], coarse.grid.shape[ax], nf,
                          *r.shape[pos + 1:])
        r = tensor.contract_t(r, [tab] * d)
        return tensor.scatter_add(r, coarse.grid.shape, (coarse.p,) * d,
                                  (True,) * d)

    # -- smoother ---------------------------------------------------------

    def _chebyshev(self, lev: _Level, k, b, x, nu: int):
        """x <- x + p(D⁻¹A)(b − A x), Chebyshev on [λmax/15, λmax]."""
        op = lev.op
        d = jnp.maximum(op.diag_A(k), 1e-30)
        lmax = jnp.asarray(lev.lmax, op.rdtype)
        lo = lmax / 15.0
        theta = 0.5 * (lmax + lo)
        delta = 0.5 * (lmax - lo)
        sigma1 = theta / delta

        r = (b - op.apply_A(x, k)) / d
        dx = r / theta
        x = x + dx
        rho_old = 1.0 / sigma1
        for _ in range(nu - 1):
            r = r - op.apply_A(dx, k) / d
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            dx = rho * rho_old * dx + (2.0 * rho / delta) * r
            x = x + dx
            rho_old = rho
        return x

    # -- V-cycle -----------------------------------------------------------

    def _vcycle(self, i: int, k, b):
        lev = self.levels[i]
        if i == len(self.levels) - 1:
            return self._chebyshev(lev, k, b, jnp.zeros_like(b),
                                   self.coarse_sweeps)
        x = self._chebyshev(lev, k, b, jnp.zeros_like(b), self.nu)
        r = b - lev.op.apply_A(x, k)
        xc = self._vcycle(i + 1, k, self._restrict(i, r, k))
        x = x + self._prolong(i, xc, k)
        return self._chebyshev(lev, k, b, x, self.nu)

    def precond(self, k) -> Callable:
        """Single-field V-cycle preconditioner W = V(k) R; the sweep's
        vmap lifting handles blocks."""
        def apply(R):
            return self._vcycle(0, k, R.astype(self.levels[0].op.dtype))
        return apply


class QPGMG(GMG):
    """Multigrid for the QUASI-PERIODIC scalar Laplacian (the Maxwell
    deflation operator L = Gᴴ M_ε G — operators/qplaplace.py). Same
    hierarchy and smoothers as :class:`GMG`, but operators and transfers
    carry the Bloch wrap phases (one compiled V-cycle, k traced).

    Used as the inner solve of the gradient projection: a few Richardson
    + V-cycle steps replace ~20-30 Jacobi-CG iterations.
    """

    def __init__(self, space: H1Space, alpha: CoefLike = 1.0,
                 beta: CoefLike = 1.0, shift: float = 0.0,
                 dtype=jnp.complex64, nu: int = 3, coarse_sweeps: int = 8,
                 min_coarse: int = 2):
        from bravais_tpu.operators.qplaplace import QPLaplace
        self.nu = nu
        self.coarse_sweeps = coarse_sweeps
        lat = space.grid.lattice

        specs = [(space.grid.shape, space.p)]
        if space.p > 1:
            specs.append((space.grid.shape, 1))
        n = np.asarray(space.grid.shape)
        while np.all(n % 2 == 0) and np.all(n // 2 >= min_coarse):
            n = n // 2
            specs.append((tuple(int(x) for x in n), 1))

        self.levels = []
        for i, (shape, p) in enumerate(specs):
            sp = (space if i == 0
                  else H1Space.make(PeriodicGrid.make(lat, shape), p,
                                    max(p + 2, 3)))
            op = QPLaplace(sp, alpha=alpha, beta=beta, shift=shift,
                           dtype=dtype)
            self.levels.append(_Level(op, self._lmax_host(op)))

        self._ptabs = []
        for i in range(len(self.levels) - 1):
            fine = self.levels[i].op.space
            coarse = self.levels[i + 1].op.space
            if fine.grid.shape == coarse.grid.shape:
                tab = _prolong_table(fine.basis.nodes)
            else:
                tab = _prolong_table(np.array([0.0, 0.5, 1.0]))
            self._ptabs.append(tab.astype(np.dtype(op.rdtype)))

    def _prolong(self, i: int, u, k=None):
        fine = self.levels[i].op.space
        coarse = self.levels[i + 1].op.space
        d = fine.dim
        tab = jnp.asarray(self._ptabs[i])
        ph = self.levels[i].op.phases(k)
        ue = tensor.gather_qp(u, coarse.grid.shape, (coarse.p,) * d,
                              (True,) * d, ph)
        ue = tensor.contract(ue, [tab] * d)
        shp = []
        for n in coarse.grid.shape:
            shp.extend([n, tab.shape[0]])
        ue = ue.reshape(shp)
        out_shape = fine.dof_shape
        for ax in range(d):
            ue = ue.reshape(*ue.shape[:ax], out_shape[ax],
                            *ue.shape[ax + 2:])
        return ue

    def _restrict(self, i: int, r, k=None):
        fine = self.levels[i].op.space
        coarse = self.levels[i + 1].op.space
        d = fine.dim
        tab = jnp.asarray(self._ptabs[i])
        nf = tab.shape[0]
        ph = self.levels[i].op.phases(k)
        for ax in range(d):
            pos = 2 * ax
            r = r.reshape(*r.shape[:pos], coarse.grid.shape[ax], nf,
                          *r.shape[pos + 1:])
        r = tensor.contract_t(r, [tab] * d)
        return tensor.scatter_add_qp(r, coarse.grid.shape,
                                     (coarse.p,) * d, (True,) * d, ph)

    def _coarse_dense_solve(self, k, b):
        """EXACT coarsest-level solve via on-the-fly dense assembly.

        Chebyshev smoothing never touches modes below λmax/15 at any
        level, so the near-null mode of the qp Laplacian near Γ (the
        constant, eigenvalue ~|k|²) would pass through a smoother-only
        V-cycle untouched — and that mode is exactly the one the Maxwell
        gradient deflation must resolve. The coarse matrix (N ≤ ~64) is
        built in-jit by applying the operator to identity columns
        (k traced; XLA folds this well) and solved directly, with a tiny
        Tikhonov guard for the exactly-singular Γ case (the spurious
        constant component is invisible through G)."""
        op = self.levels[-1].op
        shape = op.space.dof_shape
        N = int(np.prod(shape))
        eye = jnp.eye(N, dtype=op.dtype)
        cols = jax.vmap(lambda e: op.apply_A(e.reshape(shape), k).ravel()
                        )(eye)                       # rows = A e_j
        Ac = cols.T
        tr = jnp.real(jnp.trace(Ac)) / N
        guard = (1e-7 if op.rdtype == jnp.float32 else 1e-12)
        Ac = Ac + (guard * tr) * jnp.eye(N, dtype=op.dtype)
        return jnp.linalg.solve(Ac, b.ravel()).reshape(shape)

    def _vcycle(self, i: int, k, b):
        # Override: exact dense coarsest solve (see _coarse_dense_solve).
        lev = self.levels[i]
        if i == len(self.levels) - 1:
            return self._coarse_dense_solve(k, b)
        x = self._chebyshev(lev, k, b, jnp.zeros_like(b), self.nu)
        r = b - lev.op.apply_A(x, k)
        xc = self._vcycle(i + 1, k, self._restrict(i, r, k))
        x = x + self._prolong(i, xc, k)
        return self._chebyshev(lev, k, b, x, self.nu)

    def solve(self, k, b, cycles: int = 3):
        """Approximate L⁻¹ b by ``cycles`` Richardson + V-cycle steps."""
        x = self._vcycle(0, k, b)
        for _ in range(cycles - 1):
            x = x + self._vcycle(0, k, b - self.levels[0].op.apply_A(x, k))
        return x
