"""Geometric multigrid tests (SURVEY.md App. C.4): transfer consistency,
V-cycle convergence as a solver, and LOBPCG acceleration vs Jacobi."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bravais_tpu.bands import BandSweep
from bravais_tpu.eigen.gmg import GMG
from bravais_tpu.eigen.lobpcg import lobpcg
from bravais_tpu.eigen.precond import jacobi
from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.helmholtz import BlochHelmholtz
from bravais_tpu.spaces.h1 import H1Space


def _setup(n=8, p=3, lat_name="SQR", alpha=1.0, beta=1.0):
    lat = make_lattice(lat_name)
    sp = H1Space.make(PeriodicGrid.make(lat, n), p)
    op = BlochHelmholtz(sp, alpha=alpha, beta=beta, dtype=jnp.complex128)
    return lat, sp, op


def test_transfer_adjoint_and_constants():
    _, sp, op = _setup(8, 3)
    gmg = GMG(sp, dtype=jnp.complex128, fine_op=op)
    assert len(gmg.levels) >= 3
    rng = np.random.default_rng(0)
    for i in range(len(gmg.levels) - 1):
        fine = gmg.levels[i].op.space
        coarse = gmg.levels[i + 1].op.space
        uc = jnp.asarray(rng.standard_normal(coarse.dof_shape)
                         + 1j * rng.standard_normal(coarse.dof_shape))
        rf = jnp.asarray(rng.standard_normal(fine.dof_shape)
                         + 1j * rng.standard_normal(fine.dof_shape))
        Pu = gmg._prolong(i, uc)
        assert Pu.shape == fine.dof_shape
        # adjoint: <r, P u> == <R r, u>
        lhs = complex(jnp.vdot(rf, Pu))
        rhs = complex(jnp.vdot(gmg._restrict(i, rf), uc))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
        # P preserves constants (nodal interpolation)
        ones = jnp.ones(coarse.dof_shape) + 0j
        np.testing.assert_allclose(np.asarray(gmg._prolong(i, ones)), 1.0,
                                   atol=1e-13)


@pytest.mark.parametrize("alpha", [1.0])
def test_vcycle_solves_shifted_system(alpha):
    """Richardson iteration with the V-cycle must converge fast for the
    SPD system (A(k) + small shift M)."""
    lat, sp, op = _setup(8, 2)
    gmg = GMG(sp, dtype=jnp.complex128, fine_op=op)
    k = jnp.asarray(lat.k_cart((0.31, 0.17)))
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(sp.dof_shape)
                    + 1j * rng.standard_normal(sp.dof_shape))

    def Afun(x):
        return op.apply_A(x, k)

    V = gmg.precond(k)
    x = jnp.zeros_like(b)
    r0 = float(jnp.linalg.norm(b))
    for _ in range(10):
        x = x + V(b - Afun(x))
    r = float(jnp.linalg.norm(b - Afun(x)))
    assert r < 1e-5 * r0, r / r0


@pytest.mark.slow
def test_gmg_beats_jacobi_iterations():
    lat, sp, op = _setup(8, 3)
    gmg = GMG(sp, dtype=jnp.complex128, fine_op=op)
    k = jnp.asarray(lat.k_cart((0.31, 0.17)))
    rng = np.random.default_rng(2)
    m = 8
    X0 = jnp.asarray(rng.standard_normal((m,) + sp.dof_shape)
                     + 1j * rng.standard_normal((m,) + sp.dof_shape))
    A = lambda x: op.apply_A(x, k)
    r_j = lobpcg(A, op.apply_M, X0, 4, maxiter=200, tol=1e-8,
                 precond=jacobi(op.diag_A(k)))
    r_g = lobpcg(A, op.apply_M, X0, 4, maxiter=200, tol=1e-8,
                 precond=gmg.precond(k))
    assert bool(jnp.all(r_g.converged))
    assert int(r_g.iterations) < 0.5 * int(r_j.iterations), \
        (int(r_g.iterations), int(r_j.iterations))
    np.testing.assert_allclose(np.asarray(r_g.eigenvalues),
                               np.asarray(r_j.eigenvalues), rtol=1e-7)


@pytest.mark.slow
def test_gmg_in_sweep_dielectric():
    """GMG through the sweep driver on the TM dielectric problem."""
    from bravais_tpu.operators.coefficients import dielectric_rod
    lat = make_lattice("SQR")
    eps = dielectric_rod(8.9, 1.0, 0.2, 0.5 * lat.A.sum(0), lat.A)
    sp = H1Space.make(PeriodicGrid.make(lat, 8), 2)
    op = BlochHelmholtz(sp, alpha=1.0, beta=eps, dtype=jnp.complex128)
    gmg = GMG(sp, alpha=1.0, beta=eps, dtype=jnp.complex128, fine_op=op)
    k = np.asarray([lat.k_cart((0.5, 0.0))])
    # Pin Jacobi explicitly: the BandSweep default is now "auto", which
    # resolves varying-coefficient scalar operators to GMG — the very
    # comparison this test makes.
    sj = BandSweep(op, nev=4, tol=1e-8, maxiter=300,
                   precond="jacobi").run(k)
    sg = BandSweep(op, nev=4, tol=1e-8, maxiter=300,
                   precond=gmg.precond).run(k)
    np.testing.assert_allclose(sg.eigenvalues, sj.eigenvalues, rtol=1e-7)
    assert sg.iterations[0] < sj.iterations[0]


@pytest.mark.slow
def test_qpgmg_solves_deflation_operator():
    """QPGMG Richardson+V solves L = G^H M_eps G to useful accuracy,
    including the near-Γ regime (dense coarse solve handles the
    near-null constant — the mode Chebyshev smoothing cannot touch)."""
    import jax.numpy as jnp
    from bravais_tpu.lattices import make_lattice
    from bravais_tpu.meshing.grid import PeriodicGrid
    from bravais_tpu.operators.curlcurl import BlochCurlCurl
    from bravais_tpu.spaces.nedelec import NedelecSpace

    lat = make_lattice("CUB")
    sp = NedelecSpace.make(PeriodicGrid.make(lat, 4), 2)
    op = BlochCurlCurl(sp, dtype=jnp.complex128)
    gmg = op.qp_gmg()
    rng = np.random.default_rng(3)
    for kf in [(0.31, 0.17, 0.05), (2e-3, 0.0, 0.0)]:   # generic + near-Γ
        k = jnp.asarray(lat.k_cart(kf))
        phi = jnp.asarray(rng.standard_normal(sp.dof_shape)
                          + 1j * rng.standard_normal(sp.dof_shape))
        b = op.apply_Lk(phi, k)
        x = gmg.solve(k, b, cycles=5)
        rel = float(jnp.linalg.norm(op.apply_Lk(x, k) - b)
                    / jnp.linalg.norm(b))
        # contraction ≈ 0.14/cycle, measured identical at near-Γ
        assert rel < 1e-4, (kf, rel)


def test_qp_laplace_is_exactly_Lk():
    """Discrete de Rham exactness gate for the round-5 apply_Lk swap:
    QPLaplace(h1, α=ε).apply_A must equal the explicit three-operator
    chain Gᴴ M_ε G to machine precision (∇H1_p ⊂ Nédélec_p exactly,
    and curlcurl.h1 shares the Nédélec quadrature). This is an
    IDENTITY — any drift here means the twin quadrature or the phase
    convention diverged, and the production Chebyshev kernel projector
    would silently project onto the wrong kernel."""
    from bravais_tpu.operators.coefficients import dielectric_sphere
    from bravais_tpu.operators.curlcurl import BlochCurlCurl
    from bravais_tpu.spaces.nedelec import NedelecSpace

    lat = make_lattice("CUB")
    sp = NedelecSpace.make(PeriodicGrid.make(lat, 4), 3)
    eps = dielectric_sphere(13.0, 1.0, 0.25, 0.5 * lat.A.sum(axis=0),
                            lat.A)
    op = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex128)
    rng = np.random.default_rng(7)
    phi = jnp.asarray(rng.standard_normal(op.h1.dof_shape)
                      + 1j * rng.standard_normal(op.h1.dof_shape))
    for kf in [(0.3, 0.1, 0.2), (0.5, 0.0, 0.0), (2e-3, 0.0, 0.0)]:
        k = jnp.asarray(np.asarray(lat.k_cart(kf)))
        chain = op.apply_GkH(op.apply_M(op.apply_Gk(phi, k), k), k)
        twin = op.qp_L().apply_A(phi, k)
        rel = float(jnp.linalg.norm(twin - chain)
                    / jnp.linalg.norm(chain))
        assert rel < 1e-13, (kf, rel)
