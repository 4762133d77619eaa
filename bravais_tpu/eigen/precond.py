"""Preconditioners for the LOBPCG eigensolves.

Rebuild equivalents of the hypre preconditioner stack (SURVEY.md §2.2
#11, #12): operator-diagonal Jacobi and diagonally-scaled Chebyshev here;
geometric multigrid (App. C.4) and the auxiliary-space Maxwell
preconditioner live in their own modules and plug into the same
functional interface: ``precond(R) -> W`` on blocks (m, *dof_shape).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["jacobi", "chebyshev", "estimate_lmax"]


def jacobi(diag) -> Callable:
    """Diagonal (Jacobi) preconditioner W = R / diag.

    ``diag`` may be a host array (k-independent) or a traced array
    (e.g. ``op.diag_A(k)`` inside a jitted sweep).
    """
    def apply(R):
        return R / jnp.maximum(jnp.real(diag),
                               jnp.asarray(1e-30, jnp.real(R).dtype))
    return apply


def estimate_lmax(A: Callable, diag, shape, iters: int = 12,
                  seed: int = 7, dtype=jnp.complex64):
    """Power-iteration estimate of λ_max(D^{-1}A) (traced, jit-safe).

    Deterministic start vector from a host RNG; ``A`` acts on a single
    field of ``shape``. Returns a real scalar (slightly inflated for
    safety).
    """
    rng = np.random.default_rng(seed)
    v0 = jnp.asarray(rng.standard_normal(shape)
                     + 1j * rng.standard_normal(shape), dtype)
    d = jnp.maximum(jnp.real(diag), 1e-30)

    def body(_, v):
        w = A(v) / d
        nrm = jnp.linalg.norm(w)
        return w / jnp.maximum(nrm, jnp.asarray(1e-30, nrm.dtype))

    v = jax.lax.fori_loop(0, iters, body, v0 / jnp.linalg.norm(v0))
    w = A(v) / d
    lam = jnp.real(jnp.vdot(v, w)) / jnp.real(jnp.vdot(v, v))
    return 1.1 * lam


def chebyshev(A: Callable, diag, lmax, degree: int = 3,
              lmin_frac: float = 0.06) -> Callable:
    """Chebyshev smoothing preconditioner on the diagonally-scaled
    operator, targeting the interval [lmin_frac·λmax, λmax] — the
    standard multigrid smoother recipe (App. C.4) used standalone as a
    stronger-than-Jacobi LOBPCG preconditioner.

    ``A`` acts on a single field; the returned closure acts on blocks
    via the solver's vmap lifting. ``lmax`` may be traced.
    """
    lmin = lmin_frac

    def apply_block(R):
        d = jnp.maximum(jnp.real(diag), 1e-30)
        lo = lmin * lmax
        theta = 0.5 * (lmax + lo)
        delta = 0.5 * (lmax - lo)
        sigma1 = theta / delta

        def Ad(x):
            return A(x) / d

        # Chebyshev iteration for solving (D^{-1}A) x = D^{-1} r, x0 = 0.
        b = R / d
        x = b / theta
        rk = b - Ad(x)
        rho_old = 1.0 / sigma1
        dx = x

        def body(i, carry):
            x, rk, dx, rho_old = carry
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            dx = rho * rho_old * dx + (2.0 * rho / delta) * rk
            x = x + dx
            rk = rk - Ad(dx)
            return (x, rk, dx, rho)

        x, _, _, _ = jax.lax.fori_loop(0, degree - 1, body,
                                       (x, rk, dx, rho_old))
        return x

    return apply_block
