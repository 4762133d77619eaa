"""BASELINE config 5 capability run: all-14-Bravais-lattice sweep,
high-order (p=4) matrix-free, k-points vmapped into one launch per
lattice (SURVEY.md §7.1 step 10).

For every 3D Bravais lattice family (S&C variant parameters where the
family needs them) this runs the production batched sweep — the whole
k-set is ONE vmapped XLA program per lattice — on the empty-lattice
scalar Helmholtz problem at p=4, and validates the 6 lowest bands
against the analytic oracle λ = |k+G|² (SURVEY.md App. B.3), which is
exact for every lattice and every k.

k-points: 8 generic interior fractional points (the App. A sanctioned
oracle-checkable choice — eigenvalue correctness is label-independent).
On a multi-chip mesh the same program shards the k axis (tests
`test_sweep.py::test_sweep_sharded_8dev` exercises that on 8 virtual
devices; this script uses whatever devices are visible).

Usage:  python benchmarks/config5_all14.py [--n 6] [--p 4] [--nev 6]
Writes a markdown table to stdout (and docs/CONFIG5.md with --write).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


PARAMS = {
    "BCT": {"c": 0.8}, "ORCF": {"a": 0.9, "b": 1.1, "c": 1.3},
    "RHL": {"alpha": np.deg2rad(70)},
    "TRI": {"alpha": np.deg2rad(80), "beta": np.deg2rad(85),
            "gamma": np.deg2rad(75)},
}

# 8 generic interior fractional k-points (no symmetry, no Γ): every one
# is a valid analytic-oracle eigenproblem on every lattice.
KFRAC = np.array([
    [0.21, 0.13, 0.17], [0.11, 0.31, 0.07], [0.41, 0.23, 0.11],
    [0.05, 0.17, 0.37], [0.29, 0.41, 0.19], [0.33, 0.09, 0.27],
    [0.15, 0.25, 0.45], [0.37, 0.35, 0.13]])


def run_one(name, n, p, nev, tol, maxiter, mesh=None,
            engine="spectral"):
    import jax.numpy as jnp
    from bravais_tpu.bands import BandSweep
    from bravais_tpu.lattices import make_lattice
    from bravais_tpu.meshing.grid import PeriodicGrid
    from bravais_tpu.operators.helmholtz import BlochHelmholtz
    from bravais_tpu.spaces.h1 import H1Space
    from tests.oracles.analytic import scalar_bands

    lat = make_lattice(name, **PARAMS.get(name, {}))
    sp = H1Space.make(PeriodicGrid.make(lat, n), p)
    op = BlochHelmholtz(sp, dtype=jnp.complex64)
    k_cart = np.asarray([lat.k_cart(f) for f in KFRAC], np.float64)
    # "spectral" = the production engine the CLI auto-selects for
    # element-invariant coefficients (exact twisted-DFT blocks);
    # "field" = the generic Jacobi-preconditioned matrix-free path.
    solve_fn = (op.make_solve_fn(engine="spectral")
                if engine == "spectral" else None)
    sweep = BandSweep(op, nev=nev, block=nev + 4, tol=tol,
                      maxiter=maxiter, solve_fn=solve_fn)
    t0 = time.time()
    res = sweep.run(k_cart, mesh=mesh)   # ONE vmapped launch
    wall = time.time() - t0
    errs = []
    for i in range(len(k_cart)):
        ex = scalar_bands(lat, k_cart[i], nev, mmax=5)
        errs.append(np.max(np.abs(res.eigenvalues[i] - ex))
                    / max(ex.max(), 1.0))
    return {"lattice": lat.variant, "dofs": sp.ndofs,
            "max_rel_err": float(np.max(errs)),
            "mean_iters": float(np.mean(res.iterations)),
            "compile_s": res.compile_s, "solve_s": res.wall_s,
            "total_s": wall}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--p", type=int, default=4)
    ap.add_argument("--nev", type=int, default=6)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--maxiter", type=int, default=300)
    ap.add_argument("--engine", choices=["spectral", "field"],
                    default="spectral")
    ap.add_argument("--shard", action="store_true",
                    help="shard the k axis over all visible devices")
    ap.add_argument("--write", action="store_true",
                    help="write docs/CONFIG5.md")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from bravais_tpu.lattices import LATTICE_NAMES
    from bravais_tpu.parallel.mesh import kpoint_mesh

    mesh = kpoint_mesh() if args.shard else None
    dev = str(jax.devices()[0])
    rows = []
    for name in LATTICE_NAMES:
        r = run_one(name, args.n, args.p, args.nev, args.tol,
                    args.maxiter, mesh, engine=args.engine)
        rows.append(r)
        print(f"# {r['lattice']:12s} dofs={r['dofs']:6d} "
              f"err={r['max_rel_err']:.2e} iters={r['mean_iters']:5.1f} "
              f"compile={r['compile_s']:6.1f}s solve={r['solve_s']:6.2f}s",
              flush=True)

    hdr = (f"# Config 5 — all-14-lattice p={args.p} matrix-free sweep\n\n"
           f"Empty-lattice scalar Helmholtz, n={args.n} p={args.p}, "
           f"{len(KFRAC)} generic k-points per lattice in ONE vmapped "
           f"launch, nev={args.nev}, device `{dev}`"
           f"{', k axis sharded' if mesh is not None else ''}. "
           f"Validation: max relative eigenvalue error vs the analytic "
           f"oracle |k+G|^2 over all k and bands.\n\n"
           "| lattice | dofs | max rel err | mean iters | compile s | "
           "solve s |\n|---|---|---|---|---|---|\n")
    body = "".join(
        f"| {r['lattice']} | {r['dofs']} | {r['max_rel_err']:.2e} | "
        f"{r['mean_iters']:.1f} | {r['compile_s']:.1f} | "
        f"{r['solve_s']:.2f} |\n" for r in rows)
    worst = max(r["max_rel_err"] for r in rows)
    foot = (f"\nWorst-case error over all 14 families: {worst:.2e}. "
            "Generated by `python benchmarks/config5_all14.py --write`.\n")
    print(hdr + body + foot)
    if args.write:
        import pathlib
        pathlib.Path("docs/CONFIG5.md").write_text(hdr + body + foot)
    return 0 if worst < 1e-5 else 1


if __name__ == "__main__":
    sys.exit(main())
