"""Dense assembly oracle (host, NumPy complex128).

Independent straightforward assembly of the Bloch operators as dense
matrices on small meshes — the rebuild's stand-in for cross-checking
against the (unavailable) MFEM reference binary: matrix-free applies are
verified against these matrices to machine precision (SURVEY.md §4.2
item 1), and `scipy.linalg.eigh` on them provides small-problem band
oracles. Intentionally written with naive per-element loops, sharing
nothing with the JAX path except the 1D basis tables.
"""

from __future__ import annotations

import itertools

import numpy as np

from bravais_tpu.operators.helmholtz import CoefLike, eval_coefficient
from bravais_tpu.spaces.h1 import H1Space

__all__ = ["assemble_h1"]


def assemble_h1(space: H1Space, k, alpha: CoefLike = 1.0,
                beta: CoefLike = 1.0):
    """Assemble dense A(k) and M for the Bloch Helmholtz problem
    (SURVEY.md App. B.1) on ``space``. Returns (A, M), complex128,
    shape (N, N) with N = space.ndofs, dof order = C-order of the
    (N_1, ..., N_d) global grid."""
    d = space.dim
    p1 = space.p + 1
    q = space.q
    k = np.asarray(k, dtype=np.float64)
    B, D = space.basis.B, space.basis.D  # (q, p1)
    Jinv = space.grid.Jinv
    JinvT = Jinv.T

    # Local basis tables over tensor qpts/dofs, flattened:
    #   Phi[Q, L], Ghat[r, Q, L] with Q = q^d, L = p1^d.
    qidx = list(itertools.product(range(q), repeat=d))
    lidx = list(itertools.product(range(p1), repeat=d))
    Phi = np.zeros((len(qidx), len(lidx)))
    Ghat = np.zeros((d, len(qidx), len(lidx)))
    for Q, qs in enumerate(qidx):
        for L, js in enumerate(lidx):
            Phi[Q, L] = np.prod([B[qs[i], js[i]] for i in range(d)])
            for r in range(d):
                Ghat[r, Q, L] = np.prod(
                    [(D if i == r else B)[qs[i], js[i]] for i in range(d)])
    Gphys = np.einsum("rs,sQL->rQL", JinvT, Ghat)
    # P[r, Q, L] = (∇φ_L + i k φ_L)_r at qpt Q
    P = Gphys + 1j * k[:, None, None] * Phi[None]

    wq1 = space.basis.qwts
    wQ = np.array([np.prod([wq1[qs[i]] for i in range(d)]) for qs in qidx])
    wQ = wQ * space.grid.detJ

    xq = space.qpoints_phys()  # (n1,q,...,nd,q,d) interleaved
    alpha_q = eval_coefficient(alpha, xq)
    beta_q = eval_coefficient(beta, xq)
    # Reorder to (e1..ed, q1..qd) then flatten -> (nelem, Q).
    perm = [2 * i for i in range(d)] + [2 * i + 1 for i in range(d)]
    nel = space.grid.n_elements
    alpha_e = np.transpose(alpha_q, perm).reshape(nel, len(qidx))
    beta_e = np.transpose(beta_q, perm).reshape(nel, len(qidx))

    N = space.ndofs
    A = np.zeros((N, N), dtype=np.complex128)
    M = np.zeros((N, N), dtype=np.complex128)
    Nd = space.dof_shape
    strides = np.cumprod([1] + list(Nd[::-1]))[::-1][1:]  # C-order strides

    for e, es in enumerate(itertools.product(*[range(n)
                                               for n in space.grid.shape])):
        wa = wQ * alpha_e[e]
        wb = wQ * beta_e[e]
        A_loc = np.einsum("Q,rQa,rQb->ab", wa, P.conj(), P)
        M_loc = np.einsum("Q,Qa,Qb->ab", wb, Phi, Phi)
        gidx = np.array(
            [sum(((es[i] * space.p + js[i]) % Nd[i]) * strides[i]
                 for i in range(d)) for js in lidx])
        np.add.at(A, (gidx[:, None], gidx[None, :]), A_loc)
        np.add.at(M, (gidx[:, None], gidx[None, :]), M_loc)
    return A, M
