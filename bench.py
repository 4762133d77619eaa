"""Headline benchmark harness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Target metric (BASELINE.json:2): k-point eigensolves/sec. The headline
config is the FCC Maxwell 10-band Γ–X–W–L diagram; until the Nédélec
curl-curl path lands this measures the scalar Bloch Helmholtz sweep on
the same machinery (same solver, same sweep engine) and labels itself
accordingly. ``vs_baseline`` is null — the reference publishes no number
(BASELINE.md) and the MFEM binary cannot run here.

Usage: python bench.py [--nk N] [--n MESH] [--p ORDER] [--nev NEV]
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nk", type=int, default=16)
    ap.add_argument("--n", type=int, default=16, help="elements per dim")
    ap.add_argument("--p", type=int, default=4, help="order")
    ap.add_argument("--nev", type=int, default=10)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--mode", choices=["warm", "batched"], default="warm")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from bravais_tpu.bands import BandSweep
    from bravais_tpu.lattices import kpath, make_lattice
    from bravais_tpu.meshing.grid import PeriodicGrid
    from bravais_tpu.operators.helmholtz import BlochHelmholtz
    from bravais_tpu.spaces.h1 import H1Space

    lat = make_lattice("SQR")
    kp = kpath(lat, npts=args.nk)
    sp = H1Space.make(PeriodicGrid.make(lat, args.n), args.p)
    op = BlochHelmholtz(sp, dtype=jnp.complex64)
    sweep = BandSweep(op, nev=args.nev, tol=args.tol, maxiter=400)

    t_all = time.time()
    if args.mode == "warm":
        res = sweep.run_warm(kp.k_cart)
    else:
        res = sweep.run(kp.k_cart)
    total = time.time() - t_all

    # Steady-state throughput: exclude the single compiling launch.
    n_steady = max(kp.nk - 1, 1)
    solves_per_sec = n_steady / max(res.wall_s, 1e-9)

    # Accuracy cross-check against the analytic empty-lattice oracle.
    import itertools
    def exact_bands(k, nb, mmax=5):
        vals = sorted(
            float(np.sum((np.asarray(k) + np.asarray(m) @ lat.B) ** 2))
            for m in itertools.product(range(-mmax, mmax + 1), repeat=2))
        return np.asarray(vals[:nb])

    errs = []
    for i in range(kp.nk):
        ex = exact_bands(kp.k_cart[i], args.nev)
        sc = max(ex.max(), 1.0)
        errs.append(np.max(np.abs(res.eigenvalues[i] - ex)) / sc)
    max_rel_err = float(np.max(errs))

    out = {
        "metric": ("k-point eigensolves/sec (2D square scalar Helmholtz "
                   f"empty-lattice, {args.nev} bands, tol {args.tol:g}, "
                   f"n={args.n} p={args.p}; placeholder for FCC Maxwell)"),
        "value": round(solves_per_sec, 4),
        "unit": "eigensolves/s",
        "vs_baseline": None,
        "detail": {
            "device": str(jax.devices()[0]),
            "nk": kp.nk,
            "dofs": sp.ndofs,
            "mode": args.mode,
            "compile_s": round(res.compile_s, 2),
            "steady_wall_s": round(res.wall_s, 3),
            "total_wall_s": round(total, 2),
            "mean_lobpcg_iters": float(np.mean(res.iterations)),
            "max_rel_eig_err_vs_analytic": max_rel_err,
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
