"""Bloch Helmholtz operator tests (SURVEY.md §4.2 item 1): matrix-free
apply vs dense assembly to machine precision, Hermitian symmetry, PSD,
diagonals, and dense-eigensolve convergence to the analytic empty-lattice
oracle (App. B.3)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.dense import assemble_h1
from bravais_tpu.operators.helmholtz import BlochHelmholtz
from bravais_tpu.spaces.h1 import H1Space
from tests.oracles.analytic import scalar_bands


def _setup(lat_name, shape, p, alpha=1.0, beta=1.0, **lat_kw):
    lat = make_lattice(lat_name, **lat_kw)
    sp = H1Space.make(PeriodicGrid.make(lat, shape), p)
    op = BlochHelmholtz(sp, alpha=alpha, beta=beta, dtype=jnp.complex128)
    return lat, sp, op


def _rand_u(sp, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(sp.dof_shape)
                       + 1j * rng.standard_normal(sp.dof_shape))


def _eps_rod(x):
    """2D dielectric rod coefficient (smooth-ish for tests)."""
    r2 = (x[..., 0] - 0.5) ** 2 + (x[..., 1] - 0.5) ** 2
    return 1.0 + 7.6 / (1.0 + np.exp((np.sqrt(r2) - 0.2) / 0.02))


CASES = [
    ("SQR", (3, 3), 1, 1.0, 1.0, {}),
    ("SQR", (2, 3), 2, 1.0, 1.0, {}),
    ("HEX2D", (3, 3), 2, _eps_rod, 1.0, {}),   # TE-style varying alpha
    ("SQR", (3, 3), 3, 1.0, _eps_rod, {}),     # TM-style varying beta
    ("CUB", (2, 2, 2), 1, 1.0, 1.0, {}),
    ("FCC", (2, 2, 2), 2, 1.0, 1.0, {}),
    ("MCL", (2, 2, 2), 1, 1.0, 1.0, {}),
]
KS = {2: [(0.0, 0.0), (0.7, -0.3)], 3: [(0.0, 0.0, 0.0), (0.5, 0.2, -0.9)]}


@pytest.mark.parametrize("lat,shape,p,alpha,beta,kw", CASES,
                         ids=[f"{c[0]}-p{c[2]}-{i}"
                              for i, c in enumerate(CASES)])
def test_apply_matches_dense(lat, shape, p, alpha, beta, kw):
    lat_, sp, op = _setup(lat, shape, p, alpha, beta, **kw)
    A0 = None
    for k in KS[sp.dim]:
        k = np.asarray(k)
        A, M = assemble_h1(sp, k, alpha=alpha, beta=beta)
        u = _rand_u(sp)
        y_mf = np.asarray(op.apply_A(u, jnp.asarray(k))).ravel()
        y_dn = A @ np.asarray(u).ravel()
        np.testing.assert_allclose(y_mf, y_dn, rtol=1e-11, atol=1e-11)
        if A0 is None:
            m_mf = np.asarray(op.apply_M(u)).ravel()
            np.testing.assert_allclose(m_mf, M @ np.asarray(u).ravel(),
                                       rtol=1e-11, atol=1e-12)
        A0 = A


@pytest.mark.parametrize("lat,shape,p,alpha,beta,kw", CASES[:4],
                         ids=[f"{c[0]}-p{c[2]}-{i}"
                              for i, c in enumerate(CASES[:4])])
def test_hermitian_and_psd(lat, shape, p, alpha, beta, kw):
    _, sp, op = _setup(lat, shape, p, alpha, beta, **kw)
    k = jnp.asarray([0.4, -0.8][: sp.dim] if sp.dim == 2
                    else [0.4, -0.8, 0.3])
    u, v = _rand_u(sp, 1), _rand_u(sp, 2)
    Au, Av = op.apply_A(u, k), op.apply_A(v, k)
    # <A u, v> = conj(<A v, u>)  (Hermitian)
    np.testing.assert_allclose(complex(jnp.vdot(v, Au)),
                               np.conj(complex(jnp.vdot(u, Av))),
                               rtol=1e-11)
    # Rayleigh quotient real and >= 0  (A(k) PSD, SURVEY.md §4.2)
    r = complex(jnp.vdot(u, Au))
    assert abs(r.imag) < 1e-9 * abs(r.real)
    assert r.real > 0
    # M SPD
    m = complex(jnp.vdot(u, op.apply_M(u)))
    assert m.real > 0 and abs(m.imag) < 1e-10 * m.real


def test_A_at_gamma_is_real():
    _, sp, op = _setup("SQR", (3, 3), 2)
    u = jnp.asarray(np.random.default_rng(3).standard_normal(sp.dof_shape))
    y = np.asarray(op.apply_A(u + 0j, jnp.zeros(2)))
    np.testing.assert_allclose(y.imag, 0.0, atol=1e-12)


@pytest.mark.parametrize("lat,shape,p,alpha,beta,kw", CASES[:5],
                         ids=[f"{c[0]}-p{c[2]}-{i}"
                              for i, c in enumerate(CASES[:5])])
def test_diagonals_match_dense(lat, shape, p, alpha, beta, kw):
    _, sp, op = _setup(lat, shape, p, alpha, beta, **kw)
    k = np.asarray([0.3, 0.9] if sp.dim == 2 else [0.3, 0.9, -0.2])
    A, M = assemble_h1(sp, k, alpha=alpha, beta=beta)
    np.testing.assert_allclose(np.asarray(op.diag_A(jnp.asarray(k))).ravel(),
                               np.diag(A).real, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(op.diag_M).ravel(),
                               np.diag(M).real, rtol=1e-11)


def test_dense_eigs_converge_to_analytic():
    """Dense generalized eigensolve -> empty-lattice bands, h-convergence
    at rate ~2p (SURVEY.md §4.2 item 3, config-1 style)."""
    lat = make_lattice("SQR")
    k = lat.k_cart([0.31, 0.17])
    exact = scalar_bands(lat, k, 4)
    errs = []
    for n in (4, 8):
        sp = H1Space.make(PeriodicGrid.make(lat, (n, n)), 2)
        A, M = assemble_h1(sp, k)
        vals = scipy.linalg.eigh(A, M, eigvals_only=True)[:4]
        # Band 0 is exact (constant Bloch envelope is in the FE space);
        # measure convergence on bands 1..3.
        errs.append(np.max(np.abs(vals[1:] - exact[1:]) / exact[1:]))
    rate = np.log2(errs[0] / errs[1])
    assert errs[1] < 2e-3
    assert rate > 3.2  # expect ~2p = 4
    # p = 3 at n = 8 reaches ~1e-6 relative accuracy (precision plan §7.0).
    sp = H1Space.make(PeriodicGrid.make(lat, (8, 8)), 3)
    A, M = assemble_h1(sp, k)
    vals = scipy.linalg.eigh(A, M, eigvals_only=True)[:4]
    assert np.max(np.abs(vals[1:] - exact[1:]) / exact[1:]) < 1e-5


def test_dense_eigs_analytic_3d_fcc():
    lat = make_lattice("FCC")
    k = lat.point_cart("X") * 0.5
    exact = scalar_bands(lat, k, 3)
    sp = H1Space.make(PeriodicGrid.make(lat, (3, 3, 3)), 3)
    A, M = assemble_h1(sp, k)
    vals = scipy.linalg.eigh(A, M, eigvals_only=True)[:3]
    np.testing.assert_allclose(vals, exact, rtol=2e-3)
