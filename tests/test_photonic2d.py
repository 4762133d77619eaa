"""Config-2 physics integration tests (SURVEY.md §4.2 item 3): 2D
square-lattice dielectric photonic crystal, TM/TE bands.

The canonical structure (Joannopoulos, *Photonic Crystals* ch. 5; MPB
docs): square lattice of dielectric rods, ε = 8.9 (alumina), r = 0.2a in
air. Its TM polarization has a complete band gap between bands 1 and 2
with edges near ωa/2πc ≈ 0.32 and 0.44 (~31% gap/midgap); TE has no gap
there. Published values are encoded to loose (few-%) tolerance — offline
memory of the tables; the machine-precision check is the dense-oracle
self-consistency test.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from bravais_tpu.bands import BandSweep
from bravais_tpu.cli.bands_app import build_problem, run
from bravais_tpu.cli.config import RunConfig
from bravais_tpu.lattices import kpath, make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.coefficients import dielectric_rod
from bravais_tpu.operators.dense import assemble_h1
from bravais_tpu.operators.helmholtz import BlochHelmholtz
from bravais_tpu.spaces.h1 import H1Space


def _freqs(lams):
    return np.sqrt(np.maximum(np.asarray(lams), 0.0)) / (2 * np.pi)


def test_tm_matches_dense_oracle():
    """Matrix-free + LOBPCG vs dense f64 assembly — same discretization,
    must agree to solver tolerance (the parity harness, §4.2 item 5)."""
    lat = make_lattice("SQR")
    sp = H1Space.make(PeriodicGrid.make(lat, 8), 2)
    eps = dielectric_rod(8.9, 1.0, 0.2, 0.5 * lat.A.sum(0), lat.A)
    op = BlochHelmholtz(sp, alpha=1.0, beta=eps, dtype=jnp.complex128)
    sweep = BandSweep(op, nev=4, block=8, tol=1e-10, maxiter=400)
    kpts = np.asarray([lat.k_cart((0.5, 0.0)), lat.k_cart((0.25, 0.25))])
    res = sweep.run(kpts)
    for i, k in enumerate(kpts):
        A, M = assemble_h1(sp, k, alpha=1.0, beta=eps)
        exact = scipy.linalg.eigh(A, M, eigvals_only=True)[:4]
        np.testing.assert_allclose(res.eigenvalues[i], exact, rtol=1e-8,
                                   atol=1e-9)


@pytest.mark.slow
def test_tm_band_gap_vs_published():
    """TM gap of the ε=8.9, r=0.2a rod crystal vs the published MPB /
    Joannopoulos values (loose tolerance, see module docstring)."""
    cfg = RunConfig(lattice="SQR", problem="tm", eps_in=8.9, eps_out=1.0,
                    radius=0.2, n=16, p=3, nk=20, nev=3, tol=1e-8,
                    maxiter=500, precision="f64", mode="batched")
    lat, kp, op = build_problem(cfg)
    sweep = BandSweep(op, nev=3, tol=1e-8, maxiter=500)
    res = sweep.run(kp.k_cart)
    f = _freqs(res.eigenvalues)
    gap_bottom = f[:, 0].max()
    gap_top = f[:, 1].min()
    assert gap_bottom < gap_top, "TM gap must exist"
    assert abs(gap_bottom - 0.323) < 0.015, gap_bottom
    assert abs(gap_top - 0.443) < 0.020, gap_top
    gap_ratio = 2 * (gap_top - gap_bottom) / (gap_top + gap_bottom)
    assert abs(gap_ratio - 0.31) < 0.04, gap_ratio


def test_te_no_full_gap():
    cfg = RunConfig(lattice="SQR", problem="te", eps_in=8.9, eps_out=1.0,
                    radius=0.2, n=12, p=2, nk=16, nev=3, tol=1e-7,
                    maxiter=400, precision="f64", mode="batched")
    lat, kp, op = build_problem(cfg)
    res = BandSweep(op, nev=3, tol=1e-7, maxiter=400).run(kp.k_cart)
    f = _freqs(res.eigenvalues)
    # TE bands 1/2 overlap somewhere on the path -> no complete gap.
    assert f[:, 0].max() > f[:, 1].min()


def test_cli_app_end_to_end(tmp_path, capsys):
    out = tmp_path / "run"
    cfg = RunConfig(lattice="SQR", problem="tm", eps_in=8.9, eps_out=1.0,
                    radius=0.2, n=6, p=2, nk=6, nev=2, tol=1e-6,
                    maxiter=300, precision="f64", mode="batched",
                    out=str(out), plot=True)
    run(cfg)
    assert (out / "bands.npz").exists()
    assert (out / "manifest.json").exists()
    assert (out / "bands.png").exists()
    # Resume: nothing left to do.
    cfg2 = RunConfig(**{**cfg.to_dict(), "resume": True})
    msgs = []
    run(cfg2, log=msgs.append)
    assert any("already finished" in str(m) for m in msgs)


def test_cli_argparse_roundtrip():
    import argparse
    ap = argparse.ArgumentParser()
    RunConfig.add_cli_args(ap)
    ns = ap.parse_args(["--lattice", "HEX2D", "--problem", "te",
                        "--eps-in", "13.0", "--radius", "0.48",
                        "--path", "G,M,K,G", "--nev", "8"])
    cfg = RunConfig.from_cli_args(ns)
    assert cfg.lattice == "HEX2D" and cfg.problem == "te"
    assert cfg.path == [["G", "M", "K", "G"]]
    assert cfg.nev == 8 and cfg.eps_in == 13.0


def test_subcell_average_step_function():
    """subcell_average returns the in-cell area fraction of a step
    coefficient (exact for an axis-aligned step on a midpoint grid)."""
    from bravais_tpu.operators.coefficients import subcell_average

    step = lambda x: np.where(x[..., 0] < 0.5, 2.0, 8.0)
    cell = np.diag([0.1, 0.1])
    avg = subcell_average(step, cell, nsub=10)
    # point at the step: half the subcell left (2.0), half right (8.0)
    v = avg(np.array([0.5, 0.3]))
    np.testing.assert_allclose(v, 5.0, rtol=1e-12)
    # deep inside either side: unchanged
    np.testing.assert_allclose(avg(np.array([0.2, 0.3])), 2.0)
    np.testing.assert_allclose(avg(np.array([0.9, 0.3])), 8.0)


def test_te_subcell_averaging_improves_convergence():
    """TE bands with a sharp ε=8.9 rod: subcell-averaged 1/ε at n=8
    must land closer to the n=20 reference than pointwise sampling
    (the MPB subpixel-smoothing win on the staircase error)."""
    import scipy.linalg
    from bravais_tpu.cli.bands_app import build_problem
    from bravais_tpu.cli.config import RunConfig
    from bravais_tpu.operators.dense import assemble_h1

    def band1_te(n, subcell):
        cfg = RunConfig(lattice="SQR", problem="te", eps_in=8.9,
                        radius=0.2, n=n, p=2, nk=4, nev=2,
                        precision="f64", subcell=subcell)
        lat, kp, op = build_problem(cfg)
        k = lat.k_cart((0.5, 0.0))                     # X point
        A, M = assemble_h1(op.space, k, alpha=op._alpha_q64,
                           beta=op._beta_q64)
        return scipy.linalg.eigh(A, M, eigvals_only=True)[0]

    ref = band1_te(20, 4)
    err_point = abs(band1_te(8, 0) - ref) / ref
    err_avg = abs(band1_te(8, 4) - ref) / ref
    assert err_avg < 0.7 * err_point, (err_point, err_avg)


def test_hex_tm_matches_dense_oracle():
    """Hexagonal (triangular) lattice dielectric rods: matrix-free +
    LOBPCG vs dense f64 assembly on the SAME discretization — the
    non-orthogonal-cell twin of the square parity test."""
    lat = make_lattice("HEX2D")
    sp = H1Space.make(PeriodicGrid.make(lat, 8), 2)
    eps = dielectric_rod(12.0, 1.0, 0.2, 0.5 * lat.A.sum(0), lat.A)
    op = BlochHelmholtz(sp, alpha=1.0, beta=eps, dtype=jnp.complex128)
    sweep = BandSweep(op, nev=4, block=8, tol=1e-10, maxiter=400)
    kpts = np.asarray([lat.k_cart((0.5, 0.0)),        # M
                       lat.k_cart((1 / 3, 1 / 3))])   # K
    res = sweep.run(kpts)
    for i, k in enumerate(kpts):
        A, M = assemble_h1(sp, k, alpha=1.0, beta=eps)
        exact = scipy.linalg.eigh(A, M, eigvals_only=True)[:4]
        np.testing.assert_allclose(res.eigenvalues[i], exact, rtol=1e-8,
                                   atol=1e-9)


@pytest.mark.slow
def test_hex_tm_band_gap_vs_published():
    """Config-2 second half (BASELINE.json:8 'square + hexagonal'):
    the MPB tutorial 'tri-rods' crystal — triangular lattice of ε=12
    dielectric rods, r = 0.2a in air. Published TM gap between bands
    1–2: ωa/2πc ≈ 0.2756 → 0.4464 (≈47% gap/midgap). Loose-published
    + dense-oracle pattern of the square TM test; this discretization
    (n=16, p=3, f64) reproduces the edges to <0.5%."""
    cfg = RunConfig(lattice="HEX2D", problem="tm", eps_in=12.0,
                    eps_out=1.0, radius=0.2, n=16, p=3, nk=15, nev=3,
                    tol=1e-8, maxiter=500, precision="f64",
                    mode="batched")
    lat, kp, op = build_problem(cfg)
    sweep = BandSweep(op, nev=3, tol=1e-8, maxiter=500)
    res = sweep.run(kp.k_cart)
    f = _freqs(res.eigenvalues)
    gap_bottom = f[:, 0].max()
    gap_top = f[:, 1].min()
    assert gap_bottom < gap_top, "TM gap must exist"
    assert abs(gap_bottom - 0.2756) < 0.01, gap_bottom
    assert abs(gap_top - 0.4464) < 0.015, gap_top
    gap_ratio = 2 * (gap_top - gap_bottom) / (gap_top + gap_bottom)
    assert abs(gap_ratio - 0.474) < 0.03, gap_ratio


def test_hex_te_no_full_gap():
    """The tri-rods crystal has NO complete TE gap between bands 1-2
    (TE gaps need connected high-ε regions — Joannopoulos ch. 5)."""
    cfg = RunConfig(lattice="HEX2D", problem="te", eps_in=12.0,
                    eps_out=1.0, radius=0.2, n=12, p=2, nk=12, nev=3,
                    tol=1e-7, maxiter=400, precision="f64",
                    mode="batched")
    lat, kp, op = build_problem(cfg)
    res = BandSweep(op, nev=3, tol=1e-7, maxiter=400).run(kp.k_cart)
    f = _freqs(res.eigenvalues)
    assert f[:, 0].max() > f[:, 1].min()


def test_auto_precond_gmg_fixes_te_contrast_stall():
    """Varying-STIFFNESS (TE) scalar problems at high contrast defeat
    the Jacobi preconditioner: on the hex air-holes crystal (ε=13,
    r=0.48a) LOBPCG+Jacobi stagnation-stops with residual ~0.1 and
    garbage bands (measured at n=12/16 p=3; p=2 still crawls through
    at 84-113 iterations). precond="auto" (the BandSweep/CLI default)
    resolves this operator to the geometric-MG V-cycle — the
    reference's BoomerAMG role (SURVEY §2.2 #11) — and converges in
    ~10 iterations. If the Jacobi comparison below ever starts
    passing, the auto rule can be revisited; until then it documents
    why "auto" exists."""
    lat = make_lattice("HEX2D")
    sp = H1Space.make(PeriodicGrid.make(lat, 12), 3)
    eps = dielectric_rod(1.0, 13.0, 0.48, 0.5 * lat.A.sum(axis=0),
                         lat.A)
    k = lat.point_cart("M")[None]

    def solve(pre):
        op = BlochHelmholtz(sp, alpha=lambda x: 1.0 / eps(x), beta=1.0,
                            dtype=jnp.complex128)
        sweep = BandSweep(op, nev=6, block=10, tol=1e-8, maxiter=300,
                          precond=pre)
        res = sweep.run_warm(k)
        return sweep, float(np.max(res.residuals)), res

    sweep, res_auto, out = solve("auto")
    assert hasattr(sweep, "_gmg")          # auto resolved to GMG
    assert res_auto < 1e-8
    assert int(out.iterations[0]) <= 30
    _, res_jac, _ = solve("jacobi")
    assert res_jac > 100 * res_auto        # the stall auto exists for


@pytest.mark.slow
def test_hex_air_holes_complete_gap_vs_published():
    """The canonical COMPLETE-photonic-band-gap structure (Joannopoulos
    ch. 5): triangular lattice of air columns r = 0.48a in ε = 13. The
    TE 1-2 gap and the TM 2-3 gap overlap in a complete gap of ~18.6%
    gap/midgap (published). Computed here (n=16 p=3, pointwise ε,
    GMG-preconditioned via precond auto): 0.431-0.521, 18.8% — gates
    with interface-limited-convergence brackets. Exercises the
    varying-STIFFNESS (TE) axis the square/tri-rod tests don't reach."""
    lat = make_lattice("HEX2D")
    sp = H1Space.make(PeriodicGrid.make(lat, 16), 3)
    eps = dielectric_rod(1.0, 13.0, 0.48, 0.5 * lat.A.sum(axis=0),
                         lat.A)
    kp = kpath(lat, npts=13)
    bands = {}
    for pol in ("te", "tm"):
        op = (BlochHelmholtz(sp, alpha=lambda x: 1.0 / eps(x), beta=1.0,
                             dtype=jnp.complex128) if pol == "te" else
              BlochHelmholtz(sp, alpha=1.0, beta=eps,
                             dtype=jnp.complex128))
        sweep = BandSweep(op, nev=4, block=8, tol=1e-8, maxiter=300)
        res = sweep.run_warm(kp.k_cart)
        assert float(np.max(res.residuals)) < 1e-7, pol
        bands[pol] = np.sqrt(np.maximum(
            np.asarray(res.eigenvalues), 0)) / (2 * np.pi)
    te, tm = bands["te"], bands["tm"]
    lo = max(te[:, 0].max(), tm[:, 1].max())   # complete-gap bottom
    hi = min(te[:, 1].min(), tm[:, 2].min())   # complete-gap top
    assert hi > lo                              # a complete gap exists
    assert 0.42 < lo < 0.45 and 0.50 < hi < 0.53
    ratio = 2 * (hi - lo) / (hi + lo)
    assert 0.15 < ratio < 0.21                  # published ≈ 0.186
