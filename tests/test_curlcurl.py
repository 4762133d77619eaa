"""Bloch Maxwell curl-curl operator tests (SURVEY.md §4.2 item 1, §7.1
steps 6–7) — quasi-periodic formulation: matrix-free vs dense Nédélec
assembly, Hermiticity, EXACT gradient annihilation at every k (twisted
de Rham), ghost-free deflated spectra, and the deflated eigensolve
against the Maxwell empty-lattice oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.curlcurl import BlochCurlCurl
from bravais_tpu.operators.dense import assemble_nedelec
from bravais_tpu.spaces.nedelec import NedelecSpace
from tests.oracles.analytic import maxwell_bands


def _setup(lat_name="CUB", shape=2, p=1, eps=1.0, **kw):
    lat = make_lattice(lat_name, **kw)
    sp = NedelecSpace.make(PeriodicGrid.make(lat, shape), p)
    op = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex128)
    return lat, sp, op


def _rand_field(sp, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(sp.field_shape)
                       + 1j * rng.standard_normal(sp.field_shape))


def _eps_sphere(x):
    c = np.array([0.5, 0.5, 0.5])
    r = np.linalg.norm(x - c, axis=-1)
    return np.where(r < 0.3, 11.56, 1.0)


CASES = [
    ("CUB", 2, 1, 1.0, {}),
    ("CUB", 2, 2, _eps_sphere, {}),
    ("FCC", 2, 1, 1.0, {}),
    ("MCL", 2, 2, 1.0, {}),   # non-orthogonal J exercises transforms
]
KS = [(0.0, 0.0, 0.0), (0.4, -0.7, 0.2)]


@pytest.mark.parametrize("lat,shape,p,eps,kw", CASES,
                         ids=[f"{c[0]}-p{c[2]}-{i}"
                              for i, c in enumerate(CASES)])
def test_apply_matches_dense(lat, shape, p, eps, kw):
    lat_, sp, op = _setup(lat, shape, p, eps, **kw)
    u = _rand_field(sp)
    for kv in KS:
        k = np.asarray(kv)
        A, M = assemble_nedelec(sp, k, eps=eps)
        y = np.asarray(op.apply_A(u, jnp.asarray(k))).ravel()
        np.testing.assert_allclose(y, A @ np.asarray(u).ravel(),
                                   rtol=1e-10, atol=1e-10)
        m = np.asarray(op.apply_M(u, jnp.asarray(k))).ravel()
        np.testing.assert_allclose(m, M @ np.asarray(u).ravel(),
                                   rtol=1e-10, atol=1e-11)
        # host f64 twins agree too (refinement path)
        y2 = op.apply_A_np(np.asarray(u), k).ravel()
        np.testing.assert_allclose(y2, A @ np.asarray(u).ravel(),
                                   rtol=1e-10, atol=1e-10)
        m2 = op.apply_M_np(np.asarray(u), k).ravel()
        np.testing.assert_allclose(m2, M @ np.asarray(u).ravel(),
                                   rtol=1e-10, atol=1e-11)


def test_hermitian_psd():
    _, sp, op = _setup("FCC", 2, 2)
    k = jnp.asarray([0.3, -0.5, 0.8])
    u, v = _rand_field(sp, 1), _rand_field(sp, 2)
    Au, Av = op.apply_A(u, k), op.apply_A(v, k)
    np.testing.assert_allclose(complex(jnp.vdot(v, Au)),
                               np.conj(complex(jnp.vdot(u, Av))), rtol=1e-10)
    r = complex(jnp.vdot(u, Au))
    assert r.real > 0 and abs(r.imag) < 1e-9 * r.real
    mm = complex(jnp.vdot(u, op.apply_M(u, k)))
    assert mm.real > 0 and abs(mm.imag) < 1e-9 * mm.real


def test_gradient_adjoint():
    """⟨G φ, u⟩ = ⟨φ, Gᴴ u⟩ with the phase wrap."""
    _, sp, op = _setup("CUB", 2, 2)
    rng = np.random.default_rng(3)
    k = jnp.asarray([0.2, 0.6, -0.3])
    phi = jnp.asarray(rng.standard_normal(sp.dof_shape)
                      + 1j * rng.standard_normal(sp.dof_shape))
    u = _rand_field(sp, 4)
    lhs = complex(jnp.vdot(op.apply_Gk(phi, k), u))
    rhs = complex(jnp.vdot(phi, op.apply_GkH(u, k)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize("kv", KS)
def test_gradient_annihilation_exact(kv):
    """curl(∇φ) = 0 pointwise, so a(Gφ, Gφ) = 0 at EVERY k — the
    twisted discrete de Rham exactness that motivated the
    quasi-periodic formulation."""
    _, sp, op = _setup("CUB", 3, 2)
    rng = np.random.default_rng(5)
    k = jnp.asarray(np.asarray(kv))
    phi = jnp.asarray(rng.standard_normal(sp.dof_shape)
                      + 1j * rng.standard_normal(sp.dof_shape))
    g = op.apply_Gk(phi, k)
    num = complex(jnp.vdot(g, op.apply_A(g, k))).real
    den = complex(jnp.vdot(g, op.apply_M(g, k))).real
    assert num / den < 1e-22


def test_projection_removes_gradients():
    _, sp, op = _setup("CUB", 2, 2)
    rng = np.random.default_rng(6)
    k = jnp.asarray([0.4, -0.7, 0.2])
    phi = jnp.asarray(rng.standard_normal(sp.dof_shape)
                      + 1j * rng.standard_normal(sp.dof_shape))
    g = op.apply_Gk(phi, k)
    g = g / jnp.linalg.norm(g)
    pg = op.project_out_gradients(g, k, cg_iters=60)
    assert float(jnp.linalg.norm(pg)) < 1e-6
    u = _rand_field(sp, 7)
    pu = op.project_out_gradients(u, k, cg_iters=60)
    ppu = op.project_out_gradients(pu, k, cg_iters=60)
    assert float(jnp.linalg.norm(ppu - pu) / jnp.linalg.norm(pu)) < 1e-5


def test_diag_matches_dense():
    _, sp, op = _setup("FCC", 2, 1)
    k = np.asarray([0.3, 0.9, -0.2])
    A, M = assemble_nedelec(sp, k)
    np.testing.assert_allclose(np.asarray(op.diag_A()).ravel(),
                               np.diag(A).real, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(op.diag_M).ravel(),
                               np.diag(M).real, rtol=1e-10)


def _dense_deflated_bands(lat, sp, op, k, nev):
    A, M = assemble_nedelec(sp, k)
    nh1 = int(np.prod(sp.dof_shape))
    G = np.zeros((sp.ndofs, nh1), complex)
    eye = np.eye(nh1)
    for j in range(nh1):
        phi = jnp.asarray(eye[:, j].reshape(sp.dof_shape) + 0j)
        G[:, j] = np.asarray(op.apply_Gk(phi, jnp.asarray(k))).ravel()
    MG = M @ G
    Q2 = scipy.linalg.orth(MG)
    U2, _, _ = np.linalg.svd(Q2, full_matrices=True)
    comp = U2[:, Q2.shape[1]:]
    Ar = comp.conj().T @ A @ comp
    Mr = comp.conj().T @ M @ comp
    return scipy.linalg.eigh(Ar, Mr, eigvals_only=True)[:nev]


def test_dense_deflated_spectrum_ghost_free():
    """The deflated dense spectrum contains ONLY physical bands — the
    decisive property of the quasi-periodic formulation (the shifted
    form leaked ghosts below band 1; see module docstring of curlcurl)."""
    lat, sp, op = _setup("CUB", 3, 2)
    k = lat.k_cart((0.25, 0.15, 0.0))
    vals = _dense_deflated_bands(lat, sp, op, k, 6)
    exact = maxwell_bands(lat, k, 6)
    np.testing.assert_allclose(vals, exact, rtol=3e-2)
    # All deflated eigenvalues are at/above the first physical band.
    assert vals[0] > 0.9 * exact[0]


@pytest.mark.slow
def test_lobpcg_deflated_empty_lattice():
    """Matrix-free deflated LOBPCG (production path) vs the dense
    deflated oracle (discrete-to-discrete: tight) and the continuum
    oracle (loose) — §7.1 step 7 minimum Maxwell e2e."""
    from bravais_tpu.bands import BandSweep
    lat, sp, op = _setup("CUB", 3, 2)
    kf = (0.25, 0.15, 0.0)
    k = lat.k_cart(kf)
    sweep = BandSweep(op, nev=5, block=9, tol=1e-9, maxiter=400,
                      solve_fn=op.make_solve_fn(cg_iters=40))
    res = sweep.run(np.asarray([k]))
    dense_vals = _dense_deflated_bands(lat, sp, op, k, 5)
    np.testing.assert_allclose(res.eigenvalues[0], dense_vals, rtol=1e-6)
    exact = maxwell_bands(lat, k, 5)
    np.testing.assert_allclose(res.eigenvalues[0], exact, rtol=3e-2)


@pytest.mark.parametrize("lat,shape,p,eps,kw", CASES[:3],
                         ids=[f"{c[0]}-p{c[2]}-stk{i}"
                              for i, c in enumerate(CASES[:3])])
def test_stacked_applies_match_reference(lat, shape, p, eps, kw):
    """Component-stacked production path == reference einsum path."""
    _, sp, op = _setup(lat, shape, p, eps, **kw)
    u = _rand_field(sp, 11)
    for kv in KS:
        k = jnp.asarray(np.asarray(kv))
        np.testing.assert_allclose(np.asarray(op.apply_A(u, k)),
                                   np.asarray(op.apply_A_ref(u, k)),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.apply_M(u, k)),
                                   np.asarray(op.apply_M_ref(u, k)),
                                   rtol=1e-12, atol=1e-13)
