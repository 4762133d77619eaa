"""Certify config-3 dielectric eigenvalue accuracy at PRODUCTION size
(VERDICT r4 item 2 / missing item 3).

The round-4 gap: the f32+refine certification test
(tests/test_maxwell_bands.py::test_dielectric_f32_refine_certified)
runs n=4 p=2 against a complex128 DENSE oracle; nothing certified the
production n=6 p=3 configuration, and the only TPU record of it
(results/ab_r4 diel_warm.json) carried an unadjudicated 1.65e-3 max
residual. The dense oracle cannot scale to 17,496 dofs (the deflation
construction alone is O(ndofs * nh1) operator applies) — but the f64
MATRIX-FREE field engine can: same discretization, same production
solver configuration (project-cheby deflation + direct mean-twin
fastdiag preconditioner), complex128 arithmetic, tight residual stop.
Agreement between the f32 production path (device stop 1e-4 + host f64
Rayleigh-Ritz refine) and the f64 matrix-free solve measures exactly
the error the refine stage is claimed to remove.

Run on CPU (f64 needs it; axon has no f64) with NO concurrent heavy
jobs (CLAUDE.md single-core rule):

    python benchmarks/certify_dielectric.py [--n 6] [--p 3] [--nev 10]

Prints one JSON line per certified k-point plus a summary line; exit
status 1 if any k-point misses the 1e-6 relative bar.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--p", type=int, default=3)
    ap.add_argument("--nev", type=int, default=10)
    ap.add_argument("--eps-in", type=float, default=13.0)
    ap.add_argument("--radius", type=float, default=0.25)
    ap.add_argument("--k-indices", type=str, default="0,1,5,10,15",
                    help="indices into the 16-point G-X-M-R bench path. "
                    "k=1 (smallest nonzero |k|) is the round-4/5 TPU "
                    "anomaly point: its device residual stalls at "
                    "~1.7e-3 (and DEGENERATES to 2.7e-2 under a 1e-5 "
                    "stop) while every other k reaches the 1e-4 stop — "
                    "this script adjudicates whether the f64 refine "
                    "still certifies it (results/ab_r5 diel_warm*.json)")
    ap.add_argument("--bar", type=float, default=1e-6,
                    help="relative eigenvalue agreement bar")
    ap.add_argument("--f64-tol", type=float, default=1e-9,
                    help="f64 oracle residual stop")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from bravais_tpu.bands import BandSweep
    from bravais_tpu.lattices import kpath, make_lattice
    from bravais_tpu.meshing.grid import PeriodicGrid
    from bravais_tpu.operators.coefficients import dielectric_sphere
    from bravais_tpu.operators.curlcurl import BlochCurlCurl
    from bravais_tpu.spaces.nedelec import NedelecSpace

    lat = make_lattice("CUB")
    kp = kpath(lat, npts=16, path=[["G", "X", "M", "R"]])
    kc = kp.k_cart.copy()
    for i in range(kc.shape[0]):           # nudge exact Γ (bench.py rule)
        if np.linalg.norm(kc[i]) < 1e-12:
            kc[i] = 2e-2 * lat.B[0]
    idx = [int(s) for s in args.k_indices.split(",")]
    ks = np.asarray([kc[i] for i in idx])

    grid = PeriodicGrid.make(lat, args.n)
    sp = NedelecSpace.make(grid, args.p)
    center = 0.5 * lat.A.sum(axis=0)
    eps = dielectric_sphere(args.eps_in, 1.0, args.radius, center, lat.A)

    def run(dtype, device_tol, tol):
        op = BlochCurlCurl(sp, eps=eps, dtype=dtype)
        solve = op.make_solve_fn(deflation="project-cheby",
                                 precond="fastdiag")
        sweep = BandSweep(op, nev=args.nev, block=args.nev + 6,
                          tol=tol, maxiter=400, solve_fn=solve,
                          device_tol=device_tol)
        return sweep.run_warm(ks)

    t0 = time.time()
    # Production path: f32 device solve to the 1e-4 bench default stop,
    # then the host f64 Rayleigh-Ritz refine (exactly bench.py's
    # --problem dielectric configuration at the same n, p).
    r32 = run(jnp.complex64, 1e-4, 1e-6)
    t32 = time.time() - t0
    # Oracle: the SAME matrix-free pencil in complex128, converged to
    # f64-tight residuals. No refine needed (refine is f32-only).
    t0 = time.time()
    r64 = run(jnp.complex128, None, args.f64_tol)
    t64 = time.time() - t0

    worst = 0.0
    ok = True
    for j, i in enumerate(idx):
        lam32 = np.asarray(r32.eigenvalues[j])
        lam64 = np.asarray(r64.eigenvalues[j])
        rel = np.abs(lam32 - lam64) / np.maximum(np.abs(lam64), 1e-30)
        worst = max(worst, float(rel.max()))
        ok &= rel.max() < args.bar
        print(json.dumps({
            "k_index": i, "k": [float(x) for x in ks[j]],
            "max_rel_err": float(rel.max()),
            "rel_err_per_band": [float(f"{v:.3g}") for v in rel],
            "f32_iters": int(r32.iterations[j]),
            "f64_iters": int(r64.iterations[j]),
            "f32_max_resid": float(np.max(r32.residuals[j])),
            "f64_max_resid": float(np.max(r64.residuals[j])),
            "lam_lo": float(lam64[0]), "lam_hi": float(lam64[-1]),
        }))
    print(json.dumps({
        "summary": "dielectric f32+refine vs f64 matrix-free oracle",
        "n": args.n, "p": args.p, "ndofs": sp.ndofs, "nev": args.nev,
        "eps_in": args.eps_in, "radius": args.radius,
        "k_indices": idx, "bar": args.bar,
        "worst_rel_err": worst, "certified": bool(ok),
        "f32_wall_s": round(t32, 1), "f64_wall_s": round(t64, 1),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
