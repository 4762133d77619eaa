"""Pallas TPU kernel: fused sum-factorized Bloch-Helmholtz element apply.

The App. B.4 kernel contract (SURVEY.md §2.1 #3 "Pallas kernel for the
batched element apply"): per block of elements, ONE kernel performs

    values/gradients (sum-factorized 1D contractions)
    → pointwise quadrature ops with the Bloch shift (∇+ik)
    → transposed contractions

keeping every intermediate in VMEM. The XLA einsum path launches ~10
separate contraction kernels per apply with HBM round-trips between
them; this kernel is the fusion XLA cannot do on its own.

Complex is handled as separate re/im planes (axon platform rule: no
complex at boundaries; and contractions with real tables act on the
planes independently). k and the constant metric enter as scalar
prefetch / embedded constants — still one compiled program for every
k-point.

Element-block layout: the gathered E-vector is reshaped to
(n_elem, l, .., l) with the element axis BLOCKED across the grid;
the periodic gather/scatter stays outside (cheap rolls XLA fuses).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["helmholtz_block_apply"]


def _kernel(kvec_ref, u_re, u_im, alpha, beta,
            y_re, y_im, m_re, m_im, *, B, D, JinvT, Jinv, d, nq, nl):
    """One element-block: y = (local) A(k) u (Bloch-shifted stiffness)
    AND m = (local) M u (β-mass) — both in one fused pass.

    FEATURE-MAJOR layout: refs are (feat, BE) with the element axis on
    the lanes — the lane dim is never reshaped (this Mosaic build
    crashes on lane splits/merges and on small-K matmuls; contractions
    are unrolled into scalar-weighted vector adds on the VPU, with the
    1D table entries entering as static Python floats).

    u_re/u_im: (l^d, BE); alpha/beta: (q^d, BE) — coefficient times
    tensorized quadrature weights; kvec_ref: (d,) scalar prefetch.
    """
    be = u_re.shape[-1]
    ur = u_re[:]
    ui = u_im[:]

    def _contract_axis(x2, dims, i, Tnp):
        """x2 (prod(dims), BE); contract dims[i] with Tnp (new, old)."""
        new, old = Tnp.shape
        pre = 1
        for t in range(i):
            pre *= dims[t]
        post = 1
        for t in range(i + 1, d):
            post *= dims[t]
        x4 = x2.reshape(pre, old, post, be)
        outs = []
        for jn in range(new):
            acc = float(Tnp[jn, 0]) * x4[:, 0]
            for jo in range(1, old):
                acc = acc + float(Tnp[jn, jo]) * x4[:, jo]
            outs.append(acc)                  # (pre, post, BE)
        y = jnp.stack(outs, axis=1)           # (pre, new, post, BE)
        out_dims = list(dims)
        out_dims[i] = new
        return y.reshape(-1, be), out_dims

    def contract(x2, tabs):
        dims = [nl] * d
        for i in range(d):
            x2, dims = _contract_axis(x2, dims, i, tabs[i])
        return x2                             # (q^d, BE)

    def contract_t(x2, tabs):
        dims = [nq] * d
        for i in range(d):
            x2, dims = _contract_axis(x2, dims, i, tabs[i].T)
        return x2                             # (l^d, BE)

    btabs = [B] * d
    uq_r = contract(ur, btabs)
    uq_i = contract(ui, btabs)
    g_r = [contract(ur, [D if r == i else B for i in range(d)])
           for r in range(d)]
    g_i = [contract(ui, [D if r == i else B for i in range(d)])
           for r in range(d)]

    aw = alpha[:]                             # (q^d, BE), incl. weights
    bw = beta[:]

    k = [kvec_ref[i] for i in range(d)]
    f_r = []
    f_i = []
    for r in range(d):
        gp_r = sum(JinvT[r][s] * g_r[s] for s in range(d))
        gp_i = sum(JinvT[r][s] * g_i[s] for s in range(d))
        w_r = gp_r - k[r] * uq_i              # w = grad + i k u
        w_i = gp_i + k[r] * uq_r
        f_r.append(aw * w_r)
        f_i.append(aw * w_i)
    s_r = sum(k[r] * f_i[r] for r in range(d))    # s = -i k·f
    s_i = -sum(k[r] * f_r[r] for r in range(d))

    y_r = contract_t(s_r, btabs)
    y_i = contract_t(s_i, btabs)
    m_re[:] = contract_t(bw * uq_r, btabs)
    m_im[:] = contract_t(bw * uq_i, btabs)
    for r in range(d):
        fh_r = sum(Jinv[r][s] * f_r[s] for s in range(d))
        fh_i = sum(Jinv[r][s] * f_i[s] for s in range(d))
        tabs = [D if r == i else B for i in range(d)]
        y_r = y_r + contract_t(fh_r, tabs)
        y_i = y_i + contract_t(fh_i, tabs)

    y_re[:] = y_r
    y_im[:] = y_i


def helmholtz_block_apply(ue_re, ue_im, alpha_e, beta_e, kvec, *, B, D,
                          JinvT, Jinv, wq, block_e: int = 0,
                          interpret: bool = False):
    """Fused elementwise A(k)+M apply over all elements (feature-major).

    ue_re/ue_im : (l^d, NE) float32 gathered element dofs (re/im)
    alpha_e     : (q^d, NE) float32 coefficient at qpts
    beta_e      : (q^d, NE)
    kvec        : (d,) float32 (traced)
    B, D        : (q, l) numpy tables;  JinvT, Jinv: (d, d) nested lists
    wq          : (q^d,) tensorized quadrature weights × |detJ|
    Returns (y_re, y_im, m_re, m_im): (l^d, NE) each.
    """
    nld, NE = ue_re.shape
    nq = B.shape[0]
    nl = B.shape[1]
    d = len(JinvT)
    if block_e <= 0:
        # target a few MB of VMEM across the ~16 resident feature planes
        block_e = max(128, min(NE, (1 << 22) // (4 * (nq ** d))))
        while NE % block_e:
            block_e -= 1
    grid = (NE // block_e,)

    kern = partial(_kernel, B=np.asarray(B, np.float64),
                   D=np.asarray(D, np.float64),
                   JinvT=[[float(x) for x in row] for row in JinvT],
                   Jinv=[[float(x) for x in row] for row in Jinv],
                   d=d, nq=nq, nl=nl)

    def spec(height):
        # index_map receives (grid_idx, scalar_prefetch_ref)
        return pl.BlockSpec((height, block_e), lambda i, s: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec(nld), spec(nld), spec(nq ** d), spec(nq ** d)],
            out_specs=[spec(nld), spec(nld), spec(nld), spec(nld)],
        ),
        out_shape=[jax.ShapeDtypeStruct((nld, NE), jnp.float32)] * 4,
        interpret=interpret,
    )(kvec, ue_re, ue_im, alpha_e * wq[:, None], beta_e * wq[:, None])
