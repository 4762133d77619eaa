"""Pallas TPU kernel: fused cyclic-Jacobi Hermitian eigensolver sweep.

Motivation (docs/STATUS.md §6 item 2): the XLA `jacobi_eigh` lowers
each round-robin round to ~12 small (n×n) matmuls plus elementwise ops
— ~1500 sequential ops per 48×48 eigh, whose per-op issue latency
(~9 ms measured on axon) dominates the LOBPCG iteration. This kernel
runs the ENTIRE sweep schedule inside one Pallas program: all rounds
and sweeps are loop iterations over VMEM-resident (n, n) planes, so the
per-op dispatch latency disappears and only the (tiny) MXU matmul chain
remains.

Same algorithm as `jacobi_eigh` (round-robin tournament pairing with
STATIC per-round permutations folded into the rotation — no traced-
index scatters), with one structural difference: a FIXED sweep count
instead of the Rutishauser early-stop (no data-dependent while_loop
inside the kernel). `sweeps=12` is 4–5 sweeps past measured f32
convergence for the n ≤ 64 Rayleigh–Ritz matrices this serves
(quadratic convergence: extra sweeps are no-ops numerically); parity
is gated by tests/test_jacobi_eigh.py against the XLA path.

Axon Mosaic rules honored (CLAUDE.md): lane dim never reshaped (all
arrays stay (n, n) or (r, n, n) with leading-dim dynamic slices only),
aligned 2D matmuls, complex as separate re/im f32 planes, real I/O.

Enabled via BRAVAIS_JACOBI_PALLAS=1 (off by default until TPU-measured),
and only for LOOSE-rel_tol callers (the production Rayleigh–Ritz) —
exact-factorization callers stay on the converging XLA path. Tests call
`jacobi_eigh_pallas` directly (interpret=True on CPU).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["jacobi_eigh_pallas"]

_HI = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _consts(n: int):
    """Static mask/permutation constants for even n (see
    eigen/jacobi_eigh._perm_chain — same tournament schedule)."""
    from bravais_tpu.eigen.jacobi_eigh import _perm_chain
    P0, Ts = _perm_chain(n)
    h = n // 2
    eye = np.eye(n, dtype=np.float32)
    sup = np.eye(n, k=h).astype(np.float32)
    sub = np.eye(n, k=-h).astype(np.float32)
    Tstack = np.stack(Ts).astype(np.float32)          # (n-1, n, n)
    return P0.astype(np.float32), Tstack, eye, sup, sub


def _kernel(hr_ref, hi_ref, p0_ref, ts_ref, eye_ref, sup_ref, sub_ref,
            out_hr, out_hi, out_vr, out_vi, *, n, sweeps):
    h = n // 2
    eye = eye_ref[:]
    sup = sup_ref[:]
    sub = sub_ref[:]
    P0 = p0_ref[:]
    tiny = np.float32(np.finfo(np.float32).tiny * 100.0)

    def mm(a, b):
        return jax.lax.dot(a, b, precision=_HI)

    def rot(Hr, Hi):
        """Rotation matrix (Br, Bi) in the canonical pair layout."""
        # diag / superdiag-at-h via mask-multiply + row reduction —
        # no jnp.diagonal (keeps every op a plain (n, n) elementwise
        # or reduce, nothing Mosaic-fragile).
        dg = jnp.sum(Hr * eye, axis=1)                 # (n,) real diag
        ar = jnp.sum(Hr * sup, axis=1)                 # row j<h: H[j,j+h]
        ai = jnp.sum(Hi * sup, axis=1)
        app = dg
        # aqq[j] = dg[j+h] for j < h (sup's row j has its 1 at col j+h)
        aqq = jnp.sum(sup * dg[None, :], axis=1)
        # Pair math on length-n vectors: rows j >= h have ar=ai=0 ⇒
        # safe=False ⇒ t=0, s=0 (identity rotation) automatically.
        absa = jnp.sqrt(ar * ar + ai * ai)
        safe = absa > tiny
        inva = jnp.where(safe, 1.0 / jnp.where(safe, absa, 1.0), 0.0)
        pr = jnp.where(safe, ar * inva, 1.0)
        pi = jnp.where(safe, ai * inva, 0.0)
        tau = (aqq - app) * 0.5 * inva
        sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(safe, t, 0.0)
        c = jax.lax.rsqrt(1.0 + t * t)
        sr = t * c * pr
        si = t * c * pi
        # Column-indexed vectors (see jacobi_eigh._rot_B):
        # B[i,j] = eye·cfull[j] + sup·ssup[j] + sub·ssub[j] with
        # cfull[j] = c_{j mod h}, ssup[j+h] = s_j, ssub[j] = -conj(s)_j.
        # Half-shifts built with the masks (no 1-D slicing/concat —
        # Mosaic-fragile): rowmask zeroes the garbage c=1 rows >= h.
        rowmask = jnp.sum(sup, axis=1)                 # 1 for j < h
        c0 = c * rowmask
        c_hi = jnp.sum(sub * c0[None, :], axis=1)      # c0[j-h] at j>=h
        cfull = c0 + c_hi
        s_hi_r = jnp.sum(sub * sr[None, :], axis=1)    # sr[j-h] at j>=h
        s_hi_i = jnp.sum(sub * si[None, :], axis=1)
        Br = eye * cfull[None, :] + sup * s_hi_r[None, :] \
            + sub * (-sr)[None, :]
        Bi = sup * s_hi_i[None, :] + sub * si[None, :]
        return Br, Bi

    def one_round(r, st):
        Hr, Hi, Vr, Vi = st
        T = ts_ref[r]                                  # (n, n) leading-dim
        Br, Bi = rot(Hr, Hi)
        Cr = mm(Br, T)
        Ci = mm(Bi, T)
        # Z = C^H H
        Zr = mm(Cr.T, Hr) + mm(Ci.T, Hi)
        Zi = mm(Cr.T, Hi) - mm(Ci.T, Hr)
        # H' = Z C
        Hr2 = mm(Zr, Cr) - mm(Zi, Ci)
        Hi2 = mm(Zr, Ci) + mm(Zi, Cr)
        # re-hermitize (drift guard, same as the XLA path)
        Hr2 = 0.5 * (Hr2 + Hr2.T)
        Hi2 = 0.5 * (Hi2 - Hi2.T)
        # V' = V C
        Vr2 = mm(Vr, Cr) - mm(Vi, Ci)
        Vi2 = mm(Vr, Ci) + mm(Vi, Cr)
        return Hr2, Hi2, Vr2, Vi2

    def one_sweep(_, st):
        Hr, Hi, Vr, Vi = st
        # enter canonical layout: H <- P0 H P0^T ; V <- V P0^T
        Hr = mm(mm(P0, Hr), P0.T)
        Hi = mm(mm(P0, Hi), P0.T)
        Vr = mm(Vr, P0.T)
        Vi = mm(Vi, P0.T)
        st = jax.lax.fori_loop(0, n - 1, one_round, (Hr, Hi, Vr, Vi))
        return st  # ts[-1] re-enters the original layout

    Hr0 = hr_ref[:]
    Hi0 = hi_ref[:]
    Vr0 = eye
    Vi0 = jnp.zeros_like(eye)
    Hr, Hi, Vr, Vi = jax.lax.fori_loop(
        0, sweeps, one_sweep, (Hr0, Hi0, Vr0, Vi0))
    out_hr[:] = Hr
    out_hi[:] = Hi
    out_vr[:] = Vr
    out_vi[:] = Vi


def jacobi_eigh_pallas(H: jax.Array, sweeps: int = 12,
                       interpret: bool = False):
    """Eigendecomposition of ONE Hermitian complex matrix (n, n), n
    even, via the fused-sweep Pallas kernel. Returns (w, V) like
    `jacobi_eigh` (w real ascending, V columns the eigenvectors)."""
    n = H.shape[-1]
    assert H.ndim == 2 and n % 2 == 0, (H.shape,)
    P0, Tstack, eye, sup, sub = _consts(n)
    kern = partial(_kernel, n=n, sweeps=int(sweeps))
    spec2 = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        in_specs=[spec2] * 7,
        out_specs=[spec2] * 4,
        out_shape=[jax.ShapeDtypeStruct((n, n), jnp.float32)] * 4,
        interpret=interpret,
    )(jnp.real(H).astype(jnp.float32), jnp.imag(H).astype(jnp.float32),
      jnp.asarray(P0), jnp.asarray(Tstack), jnp.asarray(eye),
      jnp.asarray(sup), jnp.asarray(sub))
    Hr, Hi, Vr, Vi = outs
    w = jnp.sum(Hr * jnp.asarray(eye), axis=1)
    order = jnp.argsort(w)
    w = w[order]
    V = (Vr + 1j * Vi).astype(H.dtype)[:, order]
    return w, V
