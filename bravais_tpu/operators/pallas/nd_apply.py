"""Pallas TPU kernel: fused sum-factorized Nédélec curl-curl + mass apply.

The Maxwell half of the App. B.4 kernel contract (SURVEY.md §2.1 #4,
§7.1 step 9): per element block, ONE kernel computes both

    y = (local) A u   (curl-curl:  6 forward derivative contractions
                       → J-metric mixing → 6 transposed contractions)
    m = (local) M u   (ε-mass:     3 forward value contractions
                       → Ginv mixing → 3 transposed contractions)

keeping every quadrature-point intermediate in VMEM. The XLA stacked
path launches ~20 contraction kernels per apply with HBM round-trips.

Same proven conventions as h1_apply.py (the working axon pattern):
FEATURE-MAJOR (feat, BE) refs with the element axis on the lanes (lane
dim never reshaped), contractions unrolled into scalar-weighted vector
adds with the 1D table entries as static floats, complex as separate
re/im planes. The quasi-periodic Bloch phases live entirely in the
gather/scatter OUTSIDE the kernel (the twisted formulation has no
pointwise ik terms — operators/curlcurl.py docstring), so the kernel is
k-independent and one compiled program serves every k-point.

Component stacking: the open direction of each Nédélec component is
padded to p+1 dofs (zero slot + zero table column, matching
curlcurl._stacked_tables), so all three components share the (l³, BE)
element layout with l = p+1; the feature axis is (3·l³).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nedelec_block_apply"]

_CYC = ((0, 1, 2), (1, 2, 0), (2, 0, 1))


def _kernel(u_re, u_im, muw, epsw, y_re, y_im, m_re, m_im, *,
            tabs_val, tabs_der, J, Ginv, detJ, nq, nl):
    """One element block. u planes: (3·l³, BE); muw/epsw: (q³, BE)
    coefficient·quadrature-weight planes; outputs same shapes as u.
    tabs_val[c][i] / tabs_der[c][s][i]: static (q, l) numpy tables."""
    be = u_re.shape[-1]
    ld = nl ** 3

    def _contract_axis(x2, dims, i, Tnp, transpose):
        T = Tnp.T if transpose else Tnp
        new, old = T.shape
        pre = 1
        for t_ in range(i):
            pre *= dims[t_]
        x4 = x2.reshape(pre, old, -1, be)
        outs = []
        for jn in range(new):
            acc = float(T[jn, 0]) * x4[:, 0]
            for jo in range(1, old):
                acc = acc + float(T[jn, jo]) * x4[:, jo]
            outs.append(acc)
        y = jnp.stack(outs, axis=1)
        out_dims = list(dims)
        out_dims[i] = new
        return y.reshape(-1, be), out_dims

    def contract(x2, tabs):          # (l³, BE) -> (q³, BE)
        dims = [nl] * 3
        for i in range(3):
            x2, dims = _contract_axis(x2, dims, i, tabs[i], False)
        return x2

    def contract_t(x2, tabs):        # (q³, BE) -> (l³, BE)
        dims = [nq] * 3
        for i in range(3):
            x2, dims = _contract_axis(x2, dims, i, tabs[i], True)
        return x2

    uc_r = [u_re[c * ld:(c + 1) * ld] for c in range(3)]
    uc_i = [u_im[c * ld:(c + 1) * ld] for c in range(3)]
    mw = muw[:]
    ew = epsw[:]

    # ---- mass: m_c = Vᵀ (ε w Ginv V u) ----
    uh_r = [contract(uc_r[c], tabs_val[c]) for c in range(3)]
    uh_i = [contract(uc_i[c], tabs_val[c]) for c in range(3)]
    mr_out = []
    mi_out = []
    for r in range(3):
        g_r = ew * sum(Ginv[r][s] * uh_r[s] for s in range(3))
        g_i = ew * sum(Ginv[r][s] * uh_i[s] for s in range(3))
        mr_out.append(contract_t(g_r, tabs_val[r]))
        mi_out.append(contract_t(g_i, tabs_val[r]))
    m_re[:] = jnp.concatenate(mr_out, axis=0)
    m_im[:] = jnp.concatenate(mi_out, axis=0)

    # ---- curl-curl ----
    # chat[r] = ∂̂_s û_t − ∂̂_t û_s for cyclic (r, s, t)
    ch_r, ch_i = [], []
    for r, s, t in _CYC:
        ch_r.append(contract(uc_r[t], tabs_der[t][s])
                    - contract(uc_r[s], tabs_der[s][t]))
        ch_i.append(contract(uc_i[t], tabs_der[t][s])
                    - contract(uc_i[s], tabs_der[s][t]))
    inv_det = 1.0 / detJ
    f_r, f_i = [], []
    for r in range(3):
        cph_r = sum(J[r][s] * ch_r[s] for s in range(3))
        cph_i = sum(J[r][s] * ch_i[s] for s in range(3))
        f_r.append(mw * cph_r * inv_det)
        f_i.append(mw * cph_i * inv_det)
    cf_r = [sum(J[s][r] * f_r[s] for s in range(3)) * inv_det
            for r in range(3)]
    cf_i = [sum(J[s][r] * f_i[s] for s in range(3)) * inv_det
            for r in range(3)]
    yc_r = [None, None, None]
    yc_i = [None, None, None]

    def acc(dst, add):
        return add if dst is None else dst + add

    for r, s, t in _CYC:
        yc_r[t] = acc(yc_r[t], contract_t(cf_r[r], tabs_der[t][s]))
        yc_i[t] = acc(yc_i[t], contract_t(cf_i[r], tabs_der[t][s]))
        yc_r[s] = acc(yc_r[s], -contract_t(cf_r[r], tabs_der[s][t]))
        yc_i[s] = acc(yc_i[s], -contract_t(cf_i[r], tabs_der[s][t]))
    y_re[:] = jnp.concatenate(yc_r, axis=0)
    y_im[:] = jnp.concatenate(yc_i, axis=0)


def nedelec_block_apply(ue_re, ue_im, muw_e, epsw_e, *, Bc, Dc, Bo, Do,
                        J, Ginv, detJ, block_e: int = 0,
                        interpret: bool = False):
    """Fused (A u, M u) over all elements, feature-major.

    ue_re/ue_im : (3·l³, NE) float32 component-stacked element dofs
                  (open dims padded to l = p+1, zero pad slot)
    muw_e       : (q³, NE) float32 μ⁻¹(x_q)·w_q
    epsw_e      : (q³, NE) float32 ε(x_q)·w_q
    Bc, Dc      : (q, p+1) closed value/derivative tables
    Bo, Do      : (q, p+1) PADDED open tables (zero last column)
    J, Ginv     : 3×3 nested float lists;  detJ: float
    Returns (y_re, y_im, m_re, m_im): (3·l³, NE) each.
    """
    nq, nl = Bc.shape
    ld = nl ** 3
    NE = ue_re.shape[-1]
    if block_e <= 0:
        block_e = max(128, min(NE, (1 << 21) // (4 * (nq ** 3))))
        while NE % block_e:
            block_e -= 1
    grid = (NE // block_e,)

    Bc, Dc, Bo, Do = (np.asarray(t, np.float64) for t in (Bc, Dc, Bo, Do))
    tabs_val = [[(Bo if i == c else Bc) for i in range(3)]
                for c in range(3)]
    tabs_der = [[[((Do if s == c else Dc) if i == s
                   else (Bo if i == c else Bc)) for i in range(3)]
                 for s in range(3)] for c in range(3)]

    kern = partial(_kernel, tabs_val=tabs_val, tabs_der=tabs_der,
                   J=[[float(x) for x in row] for row in J],
                   Ginv=[[float(x) for x in row] for row in Ginv],
                   detJ=float(detJ), nq=nq, nl=nl)

    def spec(height):
        return pl.BlockSpec((height, block_e), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec(3 * ld), spec(3 * ld), spec(nq ** 3),
                  spec(nq ** 3)],
        out_specs=[spec(3 * ld), spec(3 * ld), spec(3 * ld),
                   spec(3 * ld)],
        out_shape=[jax.ShapeDtypeStruct((3 * ld, NE), jnp.float32)] * 4,
        interpret=interpret,
    )(ue_re, ue_im, muw_e, epsw_e)
