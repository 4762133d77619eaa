"""Host float64 Rayleigh–Ritz refinement.

The f32 LOBPCG converges residuals to ~1e-5 and eigenvalues to ~3e-6
relative (the f32 Rayleigh–Ritz noise floor). One final Rayleigh–Ritz in
float64 on the HOST — using the operators' matrix-free NumPy twins —
recovers eigenvalues to ~residual²/gap accuracy (≪1e-6), implementing
the precision plan of SURVEY.md §7.0 item d without needing f64 on TPU.

Cost per k-point: m applies of A and M on host (milliseconds) plus an
m×m Hermitian eigensolve. Eigenvector blocks cross the device boundary
as stacked [Re, Im] real arrays (axon rule, CLAUDE.md).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.linalg

from bravais_tpu.utils.reim import from_reim_np

__all__ = ["host_rayleigh_ritz"]


def host_rayleigh_ritz(op, X_reim: np.ndarray, k: np.ndarray, nev: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """f64 Rayleigh–Ritz of the pencil (A(k), M) on span(X).

    ``X_reim``: (2, m, *dof_shape) real-stacked eigenvector block from
    the device solve. Returns (eigenvalues[:nev], residuals[:nev]) where
    residuals are relative f64 residual norms — an independent
    a-posteriori accuracy certificate for each band.
    """
    X = from_reim_np(np.asarray(X_reim)).astype(np.complex128)
    m = X.shape[0]
    k = np.asarray(k, np.float64)
    if (hasattr(op, "gradient_component_np")
            and min(op.space.grid.shape) >= 3):
        # Maxwell: project kernel (gradient) leakage out of the block in
        # f64 BEFORE the RR — guard rows from maxiter-exhausted f32
        # solves can carry gradient components whose Rayleigh quotient
        # ~0 would otherwise surface as a spurious low band (ADVICE r1).
        X = X - op.gradient_component_np(X, k)
    Xf = X.reshape(m, -1)

    if getattr(op, "supports_batched_np", False):
        AX = np.asarray(op.apply_A_np(X, k)).reshape(m, -1)
        MX = np.asarray(op.apply_M_np(X, k)).reshape(m, -1)
    else:
        AX = np.stack([op.apply_A_np(x, k).ravel() for x in X])
        MX = np.stack([op.apply_M_np(x, k).ravel() for x in X])
    GA = Xf.conj() @ AX.T
    GM = Xf.conj() @ MX.T
    GA = 0.5 * (GA + GA.conj().T)
    GM = 0.5 * (GM + GM.conj().T)
    # Guard against (near-)dependent columns from the f32 solve.
    w, V = scipy.linalg.eigh(GM)
    good = w > 1e-10 * w.max()
    C = V[:, good] / np.sqrt(w[good])
    H = C.conj().T @ GA @ C
    theta, Y = scipy.linalg.eigh(0.5 * (H + H.conj().T))
    nev_req = nev
    nev = min(nev, theta.size)
    lam = theta[:nev]
    coeff = C @ Y[:, :nev]                      # (m, nev)
    Xr = coeff.T @ Xf
    AXr = coeff.T @ AX
    MXr = coeff.T @ MX
    R = AXr - lam[:, None] * MXr
    scale = np.maximum(np.abs(lam), max(3e-2 * np.abs(lam).max(), 1e-3))
    res = np.linalg.norm(R, axis=1) / scale
    if nev < nev_req:
        # Rank-deficient block (degenerate device exit): keep the fixed
        # output contract — pad with the top value and an unconverged
        # residual sentinel (finite; res>=1e6 is the failure signal).
        pad = nev_req - nev
        top = lam[-1] if nev else 0.0
        lam = np.concatenate([lam, np.full(pad, top)])
        res = np.concatenate([res, np.full(pad, 1e6)])
    return lam, res
