"""Empty-lattice analytic band oracles (SURVEY.md App. B.3).

With α = β = ε = μ = 1 the Bloch eigenvalues are exact for every lattice
and every k:

* scalar Helmholtz:  λ_n(k) = sorted |k + G|² over reciprocal vectors G;
* Maxwell curl-curl: ω² = |k + G|², each |k+G| ≠ 0 value with
  multiplicity 2 (transverse polarizations), after deflating the
  (∇+ik)∇φ gradient nullspace.

These are the primary correctness gates of the rebuild (SURVEY.md §4.2).
"""

from __future__ import annotations

import itertools

import numpy as np

from bravais_tpu.lattices import Lattice

__all__ = ["scalar_bands", "maxwell_bands"]


def _kpG_norms_sq(lattice: Lattice, k, mmax: int) -> np.ndarray:
    k = np.asarray(k, dtype=np.float64)
    d = lattice.dim
    out = []
    for m in itertools.product(range(-mmax, mmax + 1), repeat=d):
        G = np.asarray(m, dtype=np.float64) @ lattice.B
        out.append(float(np.sum((k + G) ** 2)))
    return np.sort(np.asarray(out))


def scalar_bands(lattice: Lattice, k, nbands: int, mmax: int = 6
                 ) -> np.ndarray:
    """Lowest ``nbands`` empty-lattice scalar eigenvalues λ = |k+G|²."""
    vals = _kpG_norms_sq(lattice, k, mmax)
    assert len(vals) >= nbands
    return vals[:nbands]


def maxwell_bands(lattice: Lattice, k, nbands: int, mmax: int = 6
                  ) -> np.ndarray:
    """Lowest ``nbands`` empty-lattice Maxwell eigenvalues ω² = |k+G|²,
    doubled (two transverse polarizations per plane wave); zero modes
    (k + G = 0) keep multiplicity 2 as well — the limit of the two
    transverse branches at the zone center."""
    vals = _kpG_norms_sq(lattice, k, mmax)
    doubled = np.sort(np.concatenate([vals, vals]))
    assert len(doubled) >= nbands
    return doubled[:nbands]
