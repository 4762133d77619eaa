"""Fast block-diagonalization (operators/fastdiag.py).

Oracle strategy (SURVEY.md §4.2): the factorized matvec must reproduce
the matrix-free applies to roundoff at arbitrary k; the block solver
must invert exactly (f64); the resulting deflation projector must be
idempotent and annihilate gradients; and the (A+sM)⁻¹ preconditioner
must cut LOBPCG iterations hard vs Jacobi (the VERDICT round-1 item-2
acceptance test, scaled down).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.curlcurl import BlochCurlCurl
from bravais_tpu.spaces.nedelec import NedelecSpace

K_TEST = np.array([0.37, -0.21, 0.55])


def _op(lat="FCC", n=3, p=2, dtype=jnp.complex128, **kw):
    sp = NedelecSpace.make(PeriodicGrid.make(make_lattice(lat), n), p)
    return BlochCurlCurl(sp, dtype=dtype, **kw)


def _rand_field(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape))


@pytest.mark.parametrize("lat,n,p", [("FCC", 3, 2), ("CUB", 4, 1),
                                     ("HEX", 3, 3)])
def test_blocks_reproduce_A_and_M(lat, n, p):
    op = _op(lat, n, p)
    fd = op.fastdiag()
    u = _rand_field(op.space.field_shape)
    k = jnp.asarray(K_TEST)
    for name, ref in [("A", op.apply_A), ("M", op.apply_M)]:
        got = np.asarray(fd.matvec([(name, 1.0)], k)(jnp.asarray(u)))
        want = np.asarray(ref(jnp.asarray(u), k))
        assert np.allclose(got, want, rtol=1e-9, atol=1e-9 *
                           np.abs(want).max()), name


def test_block_solver_exact():
    op = _op("FCC", 3, 2)
    fd = op.fastdiag()
    k = jnp.asarray(K_TEST)
    s = op.default_fd_shift()
    b = jnp.asarray(_rand_field(op.space.field_shape, 1))
    x = fd.solver([("A", 1.0), ("M", s)], k)(b)
    r = op.apply_A(x, k) + s * op.apply_M(x, k) - b
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-10


def test_deflation_projector_exact():
    op = _op("FCC", 3, 2)
    k = jnp.asarray(K_TEST)
    # P(G phi) = G phi (projector is identity on gradients) ...
    phi = jnp.asarray(_rand_field(op.h1.dof_shape, 2))
    g = op.apply_Gk(phi, k)
    Pg = op.gradient_component_fd(g, k)
    assert float(jnp.linalg.norm(Pg - g) / jnp.linalg.norm(g)) < 1e-10
    # ... and idempotent on arbitrary fields.
    u = jnp.asarray(_rand_field(op.space.field_shape, 3))
    Pu = op.gradient_component_fd(u, k)
    PPu = op.gradient_component_fd(Pu, k)
    assert float(jnp.linalg.norm(PPu - Pu) / jnp.linalg.norm(Pu)) < 1e-9
    # The deflated remainder is divergence-free: GkH M (u - Pu) = 0.
    w = op.apply_GkH(op.apply_M(u - Pu, k), k)
    ref = op.apply_GkH(op.apply_M(u, k), k)
    assert float(jnp.linalg.norm(w) / jnp.linalg.norm(ref)) < 1e-9


def test_varying_eps_falls_back_to_mean_twin():
    def eps(x):
        return 1.0 + 0.5 * np.cos(2 * np.pi * x[..., 0])

    op = _op("CUB", 4, 1, eps=eps)
    assert not op._coef_elem_invariant()
    fd = op.fastdiag()
    k = jnp.asarray(K_TEST)
    # Not exact for A(eps-varying), but a valid SPD solve of the MEAN
    # operator: check it solves its own matvec.
    b = jnp.asarray(_rand_field(op.space.field_shape, 4))
    x = fd.solver([("A", 1.0), ("M", 1.0)], k)(b)
    r = fd.matvec([("A", 1.0), ("M", 1.0)], k)(x) - b
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-10


@pytest.mark.slow
def test_project_mode_matches_shift_mode():
    """The per-iteration projection path (production) agrees with the
    σ-shift path and the analytic oracle."""
    from tests.oracles.analytic import maxwell_bands

    op = _op("FCC", 3, 2)
    lat = op.space.grid.lattice
    k = jnp.asarray(np.asarray(lat.k_cart((0.5, 0.25, 0.75))))
    nev, m = 6, 10
    rng = np.random.default_rng(1)
    X0 = jnp.asarray(rng.standard_normal((m,) + op.space.field_shape)
                     + 1j * rng.standard_normal((m,) + op.space.field_shape))
    sp_ = op.make_solve_fn(deflation="project", precond="fastdiag")
    sh_ = op.make_solve_fn(deflation="fastdiag", precond="fastdiag")
    rp = sp_(op, X0, k, nev, 1e-8, 120, None)
    rs = sh_(op, X0, k, nev, 1e-8, 120, None)
    assert bool(jnp.all(rp.converged))
    assert np.allclose(np.asarray(rp.eigenvalues),
                       np.asarray(rs.eigenvalues), rtol=1e-7, atol=1e-9)
    ex = maxwell_bands(lat, np.asarray(k), nev)
    assert np.max(np.abs(np.asarray(rp.eigenvalues) - ex)
                  / np.abs(ex)) < 0.05


@pytest.mark.slow
def test_spectral_engine_matches_field_engine():
    """engine='spectral' (all-block-space LOBPCG) reproduces the field
    engine's eigenvalues and returns back-transformed eigenvectors."""
    op = _op("FCC", 3, 2)
    lat = op.space.grid.lattice
    k = jnp.asarray(np.asarray(lat.k_cart((0.25, 0.0, 0.25))))
    nev, m = 6, 10
    rng = np.random.default_rng(2)
    X0 = jnp.asarray(rng.standard_normal((m,) + op.space.field_shape)
                     + 1j * rng.standard_normal((m,) + op.space.field_shape))
    r_sp, support = op.make_solve_fn(engine="spectral")(op, X0, k, nev,
                                                        1e-8, 120, None)
    assert support.shape == (m, int(np.prod(op.space.grid.shape)))
    r_fd = op.make_solve_fn(deflation="project", precond="fastdiag")(
        op, X0, k, nev, 1e-8, 120, None)
    assert bool(jnp.all(r_sp.converged))
    assert np.allclose(np.asarray(r_sp.eigenvalues),
                       np.asarray(r_fd.eigenvalues), rtol=1e-7, atol=1e-9)
    # Back-transformed eigenvectors live in field space and satisfy the
    # eigen-equation there.
    x = r_sp.eigenvectors[0]
    lam = float(r_sp.eigenvalues[0])
    r = op.apply_A(x, k) - lam * op.apply_M(x, k)
    nrm = float(jnp.linalg.norm(op.apply_M(x, k)))
    assert float(jnp.linalg.norm(r)) / (abs(lam) * nrm + 1e-30) < 1e-6


def test_host_gradient_cleanup():
    """gradient_component_np (refine-stage leakage cleanup) matches the
    device projector and is exact on gradients."""
    op = _op("FCC", 3, 2)
    k = np.asarray(K_TEST)
    rng = np.random.default_rng(3)
    phi = rng.standard_normal(op.h1.dof_shape) \
        + 1j * rng.standard_normal(op.h1.dof_shape)
    g = op.apply_Gk_np(phi, k)
    # numpy twins match the jax applies
    gj = np.asarray(op.apply_Gk(jnp.asarray(phi), jnp.asarray(k)))
    assert np.allclose(g, gj, rtol=1e-10, atol=1e-10 * np.abs(gj).max())
    got = op.gradient_component_np(g, k)
    assert np.linalg.norm(got - g) / np.linalg.norm(g) < 1e-9
    u = rng.standard_normal((2,) + op.space.field_shape) \
        + 1j * rng.standard_normal((2,) + op.space.field_shape)
    Pu = op.gradient_component_np(u, k)
    w = np.stack([op.apply_GkH_np(op.apply_M_np(ui - pi, k), k)
                  for ui, pi in zip(u, Pu)])
    ref = np.stack([op.apply_GkH_np(op.apply_M_np(ui, k), k) for ui in u])
    assert np.linalg.norm(w) / np.linalg.norm(ref) < 1e-9


@pytest.mark.slow
def test_fd_eigensolve_beats_jacobi():
    """FCC Maxwell, empty lattice: the fastdiag-preconditioned deflated
    LOBPCG must converge in FAR fewer iterations than Jacobi and match
    the analytic oracle (App. B.3)."""
    from tests.oracles.analytic import maxwell_bands

    op = _op("FCC", 3, 2)
    lat = op.space.grid.lattice
    k = np.asarray(lat.k_cart((0.5, 0.25, 0.75)))  # W point
    nev, m = 6, 10
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((m,) + op.space.field_shape)
                     + 1j * rng.standard_normal((m,) + op.space.field_shape))

    solve_fd = op.make_solve_fn(deflation="fastdiag", precond="fastdiag")
    r_fd = solve_fd(op, X0, jnp.asarray(k), nev, 1e-8, 120, None)
    assert bool(jnp.all(r_fd.converged))

    exact = maxwell_bands(lat, k, nev)
    disc_err = np.max(np.abs(np.asarray(r_fd.eigenvalues) - exact)
                      / np.abs(exact))
    assert disc_err < 0.05  # n=3 p=2 discretization level

    from bravais_tpu.eigen.precond import jacobi
    solve_j = op.make_solve_fn(deflation="fastdiag")
    r_j = solve_j(op, X0, jnp.asarray(k), nev, 1e-8, 120,
                  jacobi(op.diag_A()))
    # eigenvalues agree (same operator), iterations collapse
    assert np.allclose(np.asarray(r_fd.eigenvalues),
                       np.asarray(r_j.eigenvalues), rtol=1e-6, atol=1e-8)
    assert int(r_fd.iterations) <= int(r_j.iterations) // 2, (
        int(r_fd.iterations), int(r_j.iterations))


def test_spectral_refine_matches_oracle():
    """spectral_refine_np (the O(blocks·D³) f64 refine) returns the
    EXACT discrete eigenvalues: on the empty FCC lattice they must match
    the analytic |k+G|² oracle to the discretization floor, and beat the
    all-dof host Rayleigh-Ritz certificate in cost while agreeing with
    it to f64 accuracy."""
    from bravais_tpu.eigen.refine import host_rayleigh_ritz
    from bravais_tpu.utils.reim import to_reim

    op = _op("FCC", 3, 2)
    lat = op.space.grid.lattice
    k = jnp.asarray(np.asarray(lat.k_cart((0.25, 0.0, 0.25))))
    nev, m = 6, 10
    rng = np.random.default_rng(5)
    X0 = jnp.asarray(rng.standard_normal((m,) + op.space.field_shape)
                     + 1j * rng.standard_normal((m,) + op.space.field_shape))
    r, support = op.make_solve_fn(engine="spectral")(op, X0, k, nev,
                                                     1e-9, 150, None)
    lam_sp, res_sp = op.spectral_refine_np(np.asarray(support),
                                           np.asarray(k), nev)
    # exact f64 block eigenpairs: certificate residuals ~ machine
    assert np.max(res_sp) < 1e-10
    lam_rr, _ = host_rayleigh_ritz(op, np.asarray(to_reim(r.eigenvectors)),
                                   np.asarray(k), nev)
    np.testing.assert_allclose(lam_sp, lam_rr, rtol=1e-9, atol=1e-11)
    # device eigenvalues already f64 here; refine must agree
    np.testing.assert_allclose(lam_sp, np.asarray(r.eigenvalues)[:nev],
                               rtol=1e-8, atol=1e-10)


def test_spectral_refine_through_sweep_f32():
    """End-to-end: a complex64 warm sweep with the spectral engine uses
    spectral_refine_np (support path, no full-block d2h) and recovers
    f64-accurate eigenvalues below the f32 device floor."""
    from bravais_tpu.bands import BandSweep
    from tests.oracles.analytic import maxwell_bands

    op = _op("FCC", 3, 2, dtype=jnp.complex64)
    lat = op.space.grid.lattice
    ks = np.asarray([lat.k_cart((0.25, 0.0, 0.25)),
                     lat.k_cart((0.5, 0.25, 0.75))])
    solve_fn = op.make_solve_fn(engine="spectral")
    sweep = BandSweep(op, nev=4, block=8, tol=1e-6, maxiter=150,
                      solve_fn=solve_fn)
    assert sweep.refine and sweep._has_support
    res = sweep.run_warm(ks)
    # residual certificate from the f64 block eigensolve, not the f32 device
    assert np.max(res.residuals) < 1e-10
    # n=3 p=2 discretization floor is ~1e-2; band 1 equals the analytic
    # value to f64 (constant-envelope exactness); check floor-level parity
    for i, k in enumerate(ks):
        ex = maxwell_bands(lat, k, 4, mmax=3)
        err = np.abs(res.eigenvalues[i] - ex) / np.maximum(ex, 1e-3)
        assert np.max(err) < 5e-2, (i, res.eigenvalues[i], ex)


def test_scalar_spectral_engine_vs_oracle():
    """Scalar (H1) spectral engine: quasi-periodic block LOBPCG + exact
    f64 block refine must hit the analytic |k+G|² oracle at the
    discretization floor, with machine-level residual certificates."""
    from bravais_tpu.bands import BandSweep
    from bravais_tpu.operators.helmholtz import BlochHelmholtz
    from bravais_tpu.spaces.h1 import H1Space
    from tests.oracles.analytic import scalar_bands

    for latname, n, p, floor in [("SQR", 6, 3, 1e-4), ("FCC", 4, 3, 5e-4)]:
        lat = make_lattice(latname)
        sp = H1Space.make(PeriodicGrid.make(lat, n), p)
        op = BlochHelmholtz(sp, dtype=jnp.complex64)
        sweep = BandSweep(op, nev=5, block=9, tol=1e-6, maxiter=200,
                          solve_fn=op.make_solve_fn(engine="spectral"))
        assert sweep._has_support
        kf = [0.21, 0.13, 0.17][:sp.dim]
        ks = np.asarray([lat.k_cart(kf)])
        res = sweep.run_warm(ks)
        assert np.max(res.residuals) < 1e-10          # f64 certificate
        ex = scalar_bands(lat, ks[0], 5, mmax=5)
        err = np.max(np.abs(res.eigenvalues[0] - ex) / max(ex.max(), 1.0))
        assert err < floor, (latname, err)


def test_scalar_spectral_varying_coef_rejected():
    """Varying β: the spectral engine would solve the WRONG (mean-
    coefficient) pencil, so it must refuse; the mean-twin FastDiag
    itself still builds (it remains a valid preconditioner)."""
    from bravais_tpu.operators.helmholtz import BlochHelmholtz
    from bravais_tpu.spaces.h1 import H1Space

    lat = make_lattice("SQR")
    sp = H1Space.make(PeriodicGrid.make(lat, 4), 2)
    op = BlochHelmholtz(sp, beta=lambda x: 1 + 0.5 * x[..., 0],
                        dtype=jnp.complex64)
    assert not op._coef_elem_invariant()
    with pytest.raises(ValueError, match="element-translation"):
        op.make_solve_fn(engine="spectral")
    fd = op.qp_fastdiag()   # mean-coefficient twin builds fine
    assert set(fd.stencils) == {"A", "M"}


def test_spectral_refine_empty_support_returns_none():
    """All-zero support (a degenerate/collapsed device solve) must
    signal the caller's fallback path with None, not crash on an empty
    concatenate (round-4 bug: ValueError inside the warm-sweep refine
    took down the whole bench run)."""
    from bravais_tpu.operators.helmholtz import BlochHelmholtz
    from bravais_tpu.spaces.h1 import H1Space

    op = _op(n=3, p=1)
    sup = np.zeros((12, op.fastdiag_G().nblocks))
    assert op.spectral_refine_np(sup, K_TEST, 4) is None

    sph = H1Space.make(PeriodicGrid.make(make_lattice("SQR"), 4), 2)
    oph = BlochHelmholtz(sph, dtype=jnp.complex128)
    fd = oph.qp_fastdiag()
    suph = np.zeros((8, fd.nblocks))
    assert fd.spectral_refine_np(suph, np.array([0.3, 0.1]), 4) is None


def test_blocks_np_multi_matches_single():
    """The fused multi-stencil host block builder (refine critical
    path) must agree with per-stencil blocks_np, including the
    rectangular G stencil and the cached concat on a second call."""
    op = _op("FCC", 3, 2)
    fd = op.fastdiag_G()
    k = K_TEST
    idx = np.asarray([0, 3, 7, 11], np.int64)
    for _ in range(2):  # second pass exercises the concat cache
        TA, TM, TG = fd.blocks_np_multi(["A", "M", "G"], k, idx)
        np.testing.assert_allclose(
            TA, fd.blocks_np([("A", 1.0)], k, idx), rtol=1e-13)
        np.testing.assert_allclose(
            TM, fd.blocks_np([("M", 1.0)], k, idx), rtol=1e-13)
        np.testing.assert_allclose(
            TG, fd.blocks_np([("G", 1.0)], k, idx), rtol=1e-13)


def test_host_rr_sigma_shift_matches_dense_varying_eps():
    """The σ-shift host Rayleigh–Ritz (the varying-ε refine path) on a
    rich subspace must reproduce the dense f64 deflated eigenvalues —
    gradient directions in the subspace must NOT surface as spurious
    low bands (the failure the shift replaces the CG projection for)."""
    import scipy.linalg
    from bravais_tpu.eigen.refine import host_rayleigh_ritz
    from bravais_tpu.operators.coefficients import dielectric_sphere
    from bravais_tpu.utils.reim import to_reim_np

    lat = make_lattice("CUB")
    sp = NedelecSpace.make(PeriodicGrid.make(lat, 3), 1)
    eps = dielectric_sphere(13.0, 1.0, 0.3, 0.5 * lat.A.sum(axis=0),
                            lat.A)
    op = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex128)
    k = np.asarray([0.31, 0.11, -0.23])
    N = sp.ndofs
    # Dense pencil + exact deflated spectrum (oracle).
    eyeN = np.eye(N)
    def dense(apply):
        cols = [np.asarray(apply(eyeN[:, j].reshape(sp.field_shape),
                                 k)).ravel() for j in range(N)]
        return np.stack(cols, axis=1)
    A = dense(op.apply_A_np)
    M = dense(op.apply_M_np)
    A = 0.5 * (A + A.conj().T)
    M = 0.5 * (M + M.conj().T)
    # gradient basis: G applied to H1 unit vectors
    Nh = op.h1.ndofs
    eyeH = np.eye(Nh)
    Gcols = [np.asarray(op.apply_Gk_np(
        eyeH[:, j].reshape(op.h1.dof_shape), k)).ravel()
        for j in range(Nh)]
    G = np.stack(Gcols, axis=1)
    # deflated oracle: eig restricted to the M-orthogonal complement
    C = (M @ G).conj().T
    _, s, Vh = np.linalg.svd(C, full_matrices=True)
    rk = int(np.sum(s > 1e-10 * s[0]))
    Nn = Vh[rk:].conj().T
    w_exact = scipy.linalg.eigh(Nn.conj().T @ A @ Nn,
                                Nn.conj().T @ M @ Nn,
                                eigvals_only=True)
    nev = 4
    # Subspace: exact lowest eigenvectors CONTAMINATED with gradient
    # leakage + two PURE-gradient guard rows (the spurious-low-band
    # stressor the shift replaces the CG projection for). Unlike the
    # explicit projection, the shift's eigenvalue error is SECOND
    # order in the leakage (measured ~17·ε² relative at ε leakage):
    # 1e-4 is an upper bound on production leakage after the device's
    # per-iteration contracting kernel projection (the ε=13/30
    # f32-certification tests gate the REAL production vectors at
    # 1e-6), so the bar here is the same 1e-6 production bar.
    w_all, V_all = scipy.linalg.eigh(Nn.conj().T @ A @ Nn,
                                     Nn.conj().T @ M @ Nn)
    Xp = (Nn @ V_all[:, :nev]).T                 # (nev, N) physical
    rng = np.random.default_rng(0)
    gdirs = (G @ rng.standard_normal((Nh, nev + 2))).T
    gdirs /= np.linalg.norm(gdirs, axis=1, keepdims=True)
    X = np.concatenate([Xp + 1e-4 * gdirs[:nev], gdirs[nev:]], axis=0)
    X = X.reshape(nev + 2, *sp.field_shape)
    lam, res = host_rayleigh_ritz(op, to_reim_np(X), k, nev)
    rel = np.abs(lam - w_exact[:nev]) / np.abs(w_exact[:nev])
    assert rel.max() < 1e-6, (lam, w_exact[:nev])
    assert res.max() < 1e-3, res


def test_spectral_refine_exact_gamma_guard():
    """spectral_refine_np at EXACT Γ (un-nudged): the σ-shift's
    Cholesky rank-drop guard must zero the degenerate gradient
    direction instead of dividing by ~0 — finite output, machine-level
    certificates, and the correct Γ physics (three ω²=0 constant-field
    modes, then the first Brillouin shell at the discrete value)."""
    import itertools

    lat = make_lattice("CUB")
    sp = NedelecSpace.make(PeriodicGrid.make(lat, 3), 2)
    op = BlochCurlCurl(sp, dtype=jnp.complex64)
    fd = op.fastdiag_G()
    k = np.zeros(3)
    nev = 6
    best = []
    for f in itertools.product(*[range(n) for n in fd.shape]):
        vals = [np.sum(((np.array(f) + np.array(fd.shape)
                         * np.array(mm)) @ lat.B) ** 2)
                for mm in itertools.product((-1, 0, 1), repeat=3)]
        best.append((min(vals), np.ravel_multi_index(f, fd.shape)))
    best.sort()
    support = np.zeros((nev + 2, fd.nblocks))
    for r in range(nev + 2):
        support[r, best[min(r, 4)][1]] = 1.0
    lam, res = op.spectral_refine_np(support, k, nev)
    assert np.all(np.isfinite(lam)) and np.all(np.isfinite(res))
    assert res.max() < 1e-10
    assert np.sum(np.abs(lam) < 1e-8) == 3      # constant fields at Γ
    shell = lam[np.abs(lam) > 1e-8]
    ex = float(np.sum(lat.B[0] ** 2))           # |b|² continuum shell
    assert np.all(np.abs(shell - ex) / ex < 0.05)  # n=3 p=2 h-error


def test_host_rr_rows_spans_full_block_on_fallback():
    """``rows`` semantics of host_rayleigh_ritz (round-4e review): the
    default nev+2 trim is a per-k cost optimization for HEALTHY device
    blocks (rows ascending by Ritz value) — but the failed-cross-check
    fallback in BandSweep._refine_host suspects a TRUE band mis-sorted
    into a guard row (the warm-start mis-sort mode the rank-aware done
    fix documents), so it must span ALL m rows. A block whose 3rd-lowest
    eigenvector sits in the LAST row is missed by the trimmed RR by
    construction and recovered by the full-row RR."""
    import scipy.linalg

    from bravais_tpu.eigen.refine import host_rayleigh_ritz
    from bravais_tpu.operators.dense import assemble_h1
    from bravais_tpu.operators.helmholtz import BlochHelmholtz
    from bravais_tpu.spaces.h1 import H1Space
    from bravais_tpu.utils.reim import to_reim_np

    lat = make_lattice("SQR")
    sp = H1Space.make(PeriodicGrid.make(lat, 6), 1)
    op = BlochHelmholtz(sp, dtype=jnp.complex128)
    k = np.asarray(lat.k_cart((0.3, 0.1)), np.float64)
    A, M = assemble_h1(sp, k)
    w, V = scipy.linalg.eigh(A, M)
    nev, m = 3, 7
    # rows 0-1: lowest two bands; rows 2-5: CONVERGED but higher bands
    # (mis-sorted guard rows); row 6 (last): the true 3rd band.
    order = [0, 1, 10, 11, 12, 13, 2]
    X = V[:, order].T.reshape(m, *sp.dof_shape)
    lam_trim, _ = host_rayleigh_ritz(op, to_reim_np(X), k, nev)
    lam_full, _ = host_rayleigh_ritz(op, to_reim_np(X), k, nev,
                                     rows=m)
    np.testing.assert_allclose(lam_full, w[:nev], rtol=1e-10,
                               atol=1e-12)
    # The trimmed subspace cannot contain the 3rd band: its 3rd Ritz
    # value is the 10th exact band, far above.
    assert lam_trim[2] > w[nev - 1] * (1.0 + 1e-6), (lam_trim, w[:4])
