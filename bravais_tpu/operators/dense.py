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


def assemble_nedelec(space, k, eps: CoefLike = 1.0, mu_inv: CoefLike = 1.0):
    """Dense A(k), M for the Bloch Maxwell problem in the QUASI-PERIODIC
    formulation (plain curl-curl; k enters only as the Bloch phase
    e^{i k·a_i} on dofs whose periodic image wraps — the realization the
    curlcurl module uses; see its docstring). complex128, (N, N) with
    N = 3·(n p)³; dof order = C-order of (3, N1, N2, N3).

    Independent naive assembly (covariant value transform J^{-T},
    curl transform J/det J) for cross-checking the matrix-free applies.
    """
    p = space.p
    q = space.q
    k = np.asarray(k, dtype=np.float64)
    Bc, Dc = space.closed.B, space.closed.D    # (q, p+1)
    Bo, Do = space.open.B, space.open.D        # (q, p)
    J = space.grid.J
    Jinv = space.grid.Jinv
    JinvT = Jinv.T
    detJs = np.linalg.det(J)
    eye = np.eye(3)

    qidx = list(itertools.product(range(q), repeat=3))
    # local index: (c, j1, j2, j3) with j_c in 0..p-1, others 0..p
    lidx = []
    for c in range(3):
        sizes = [p if i == c else p + 1 for i in range(3)]
        for js in itertools.product(*[range(s) for s in sizes]):
            lidx.append((c,) + js)
    nL = len(lidx)
    nQ = len(qidx)

    Val = np.zeros((3, nQ, nL))       # physical value vector
    Crl = np.zeros((3, nQ, nL))       # physical curl vector
    for L, (c, *js) in enumerate(lidx):
        for Q, qs in enumerate(qidx):
            phi = 1.0
            grad = np.ones(3)
            for i in range(3):
                tab_v = Bo if i == c else Bc
                phi *= tab_v[qs[i], js[i]]
            for s in range(3):
                g = 1.0
                for i in range(3):
                    if i == s:
                        g *= (Do if i == c else Dc)[qs[i], js[i]]
                    else:
                        g *= (Bo if i == c else Bc)[qs[i], js[i]]
                grad[s] = g
            Val[:, Q, L] = JinvT[:, c] * phi
            Crl[:, Q, L] = J @ np.cross(grad, eye[c]) / detJs
    P = Crl.astype(complex)   # quasi-periodic: no ik x val term
    phases = np.exp(1j * (np.asarray(space.grid.lattice.A) @ k))

    wq1 = space.closed.qwts
    wQ = np.array([np.prod([wq1[qs[i]] for i in range(3)]) for qs in qidx])
    wQ = wQ * abs(detJs)

    xq = space.qpoints_phys()
    eps_q = eval_coefficient(eps, xq)
    mu_q = eval_coefficient(mu_inv, xq)
    perm = [0, 2, 4, 1, 3, 5]
    nel = space.grid.n_elements
    eps_e = np.transpose(eps_q, perm).reshape(nel, nQ)
    mu_e = np.transpose(mu_q, perm).reshape(nel, nQ)

    Nd = space.dof_shape
    Ncomp = int(np.prod(Nd))
    N = 3 * Ncomp
    strides = np.array([Nd[1] * Nd[2], Nd[2], 1])
    A = np.zeros((N, N), dtype=np.complex128)
    M = np.zeros((N, N), dtype=np.complex128)

    for e, es in enumerate(itertools.product(*[range(n)
                                               for n in space.grid.shape])):
        wa = wQ * mu_e[e]
        wb = wQ * eps_e[e]
        A_loc = np.einsum("Q,rQa,rQb->ab", wa, P.conj(), P)
        M_loc = np.einsum("Q,rQa,rQb->ab", wb, Val, Val)
        gidx = np.empty(nL, dtype=np.int64)
        pf = np.ones(nL, dtype=complex)   # Bloch phase of each local dof
        for L, (c, *js) in enumerate(lidx):
            flat = 0
            for i in range(3):
                gi_raw = es[i] * p + js[i]
                gi = gi_raw % Nd[i]
                if gi_raw >= Nd[i]:       # wrapped copy: local value =
                    pf[L] *= phases[i]    # phase * stored dof value
                flat += gi * strides[i]
            gidx[L] = c * Ncomp + flat
        # u_loc = diag(pf) u_glob  =>  A_glob += pf^H_a A_loc pf_b
        A_ph = np.conj(pf)[:, None] * A_loc * pf[None, :]
        M_ph = np.conj(pf)[:, None] * M_loc * pf[None, :]
        np.add.at(A, (gidx[:, None], gidx[None, :]), A_ph)
        np.add.at(M, (gidx[:, None], gidx[None, :]), M_ph)
    return A, M
