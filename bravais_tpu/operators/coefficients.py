"""Material coefficient helpers for photonic-crystal problems.

The reference resolves material interfaces with body-fitted meshes; the
rebuild resolves them in the *coefficient* (SURVEY.md §7.0 item 1):
ε(x) is sampled at quadrature points, optionally with subcell averaging
(the MPB smoothing approach) for faster h-convergence at sharp
interfaces. All host-side NumPy.

Geometry convention: shape predicates take physical coordinates
``x`` of shape (..., d) and return booleans; coefficients combine an
inside/outside value through a predicate or a smoothed indicator.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

__all__ = ["dielectric_rod", "dielectric_sphere", "smoothed_indicator",
           "periodic_distance", "subcell_average"]


def periodic_distance(x: np.ndarray, center, lattice_A: np.ndarray
                      ) -> np.ndarray:
    """Distance from ``x`` (..., d) to ``center`` modulo lattice
    translations (nearest image over the 3^d neighbor cells)."""
    d = x.shape[-1]
    delta = x - np.asarray(center, dtype=np.float64)
    best = None
    from itertools import product
    for shift in product((-1.0, 0.0, 1.0), repeat=d):
        t = delta + np.asarray(shift) @ lattice_A
        r = np.linalg.norm(t, axis=-1)
        best = r if best is None else np.minimum(best, r)
    return best


def smoothed_indicator(r: np.ndarray, radius: float, width: float
                       ) -> np.ndarray:
    """~1 inside r < radius, ~0 outside, smoothed over ``width``
    (tanh profile). width=0 gives the sharp indicator."""
    if width <= 0:
        return (r < radius).astype(np.float64)
    return 0.5 * (1.0 - np.tanh((r - radius) / width))


def dielectric_rod(eps_in: float, eps_out: float, radius: float,
                   center, lattice_A: np.ndarray,
                   width: float = 0.0) -> Callable:
    """2D circular rod (or 3D cylinder along no axis — use sphere for 3D)
    of permittivity ``eps_in`` in background ``eps_out``, periodically
    repeated. Classic MPB/Joannopoulos test geometry (SURVEY.md §4.1)."""
    def eps(x: np.ndarray) -> np.ndarray:
        r = periodic_distance(x, center, lattice_A)
        ind = smoothed_indicator(r, radius, width)
        return eps_out + (eps_in - eps_out) * ind
    return eps


# 3D: same formula — the periodic distance handles it.
dielectric_sphere = dielectric_rod


def subcell_average(fn: Callable, cell_vectors: np.ndarray,
                    nsub: int = 4) -> Callable:
    """MPB-style subcell smoothing: evaluate the coefficient on an
    ``nsub``^d midpoint grid spanning the quadrature subcell around
    each sample point and return the arithmetic mean — the weak form
    then integrates the locally averaged material instead of a
    pointwise-sampled sharp interface (kills the O(1) staircase jitter
    of interface quadrature; SURVEY.md §7.0 item 1).

    ``cell_vectors``: (d, d) rows spanning the averaging cell in
    physical coordinates — pass ``lattice.A / (n * q)`` (the
    quadrature-point spacing). TM passes ε itself; TE passes 1/ε (the
    coefficient the weak form actually integrates), which makes this
    the arithmetic/harmonic pair of classic subpixel smoothing."""
    V = np.asarray(cell_vectors, np.float64)
    d = V.shape[0]
    ax = [(np.arange(nsub) + 0.5) / nsub - 0.5 for _ in range(d)]
    mesh = np.meshgrid(*ax, indexing="ij")
    frac = np.stack([m.ravel() for m in mesh], axis=-1)  # (nsub^d, d)
    disp = frac @ V                                      # (nsub^d, d)

    def avg(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        vals = fn(x[..., None, :] + disp)                # (..., nsub^d)
        return np.mean(vals, axis=-1)

    return avg
