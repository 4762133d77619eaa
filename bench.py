"""Headline benchmark harness (BASELINE.json:2).

Metric: k-point eigensolves/sec — FCC Maxwell band diagram, 10 bands,
Γ–X–W–L path, eigenvalue tolerance 1e-6 (f32 device solve converged to
residual 1e-5 + host f64 Rayleigh–Ritz refinement; the achieved
eigenvalue error vs the analytic empty-lattice oracle is measured and
reported — SURVEY.md §7.0 precision plan).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` is null: the reference publishes no number (BASELINE.md)
and the MFEM binary cannot run in this environment.

Usage:
    python bench.py                     # headline FCC Maxwell
    python bench.py --problem scalar    # 2D scalar Helmholtz variant
"""

import argparse
import itertools
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", choices=["maxwell", "scalar"],
                    default="maxwell")
    ap.add_argument("--nk", type=int, default=16)
    ap.add_argument("--n", type=int, default=0,
                    help="elements per dim (0 = per-problem default)")
    ap.add_argument("--p", type=int, default=0, help="order (0 = default)")
    ap.add_argument("--nev", type=int, default=10)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--mode", choices=["warm", "batched"], default="warm")
    ap.add_argument("--chunk", type=int, default=0,
                    help="batched mode: k-points per launch (bounds "
                    "program size; 0 = all nk in one launch)")
    ap.add_argument("--engine", choices=["spectral", "field"],
                    default="spectral",
                    help="Maxwell solve engine: 'spectral' = all-block-"
                    "space LOBPCG (exact for the empty-lattice headline;"
                    " max MXU), 'field' = matrix-free applies with "
                    "fastdiag projection/preconditioning (general eps)")
    ap.add_argument("--cg-iters", type=int, default=20)
    ap.add_argument("--maxiter", type=int, default=0,
                    help="LOBPCG maxiter (0 = per-problem default)")
    args = ap.parse_args()

    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from bravais_tpu.bands import BandSweep
    from bravais_tpu.lattices import kpath, make_lattice
    from bravais_tpu.meshing.grid import PeriodicGrid

    if args.problem == "maxwell":
        from bravais_tpu.operators.curlcurl import BlochCurlCurl
        from bravais_tpu.spaces.nedelec import NedelecSpace
        n = args.n or 8
        p = args.p or 4   # n=8 p=4: 2.8e-8 eig err — true 1e-6-target
        # compliance (n=6 p=3 floors at 2.9e-5; n=12 p=3 at 4.4e-7)
        lat = make_lattice("FCC")
        kp = kpath(lat, npts=args.nk, path=[["G", "X", "W", "L"]])
        sp = NedelecSpace.make(PeriodicGrid.make(lat, n), p)
        op = BlochCurlCurl(sp, dtype=jnp.complex64)
        # Production Maxwell path (round 2): exact fast-diagonal
        # gradient projection + (A+sM)^-1 block preconditioner —
        # 11-20 LOBPCG iterations/k at every tested size (vs 126-256
        # on Jacobi in round 1, which also failed outright at n=8 p=3).
        if args.engine == "spectral":
            solve_fn = op.make_solve_fn(engine="spectral")
        else:
            solve_fn = op.make_solve_fn(deflation="project",
                                        precond="fastdiag")
        sweep = BandSweep(op, nev=args.nev, block=args.nev + 6,
                          tol=args.tol, maxiter=args.maxiter or 250,
                          solve_fn=solve_fn)
        metric = (f"k-point eigensolves/sec (FCC Maxwell G-X-W-L, "
                  f"{args.nev} bands, n={n} p={p}; solver tol {args.tol:g},"
                  f" achieved eig err reported in detail)")
        mmax, mult = 3, 2
    else:
        from bravais_tpu.operators.helmholtz import BlochHelmholtz
        from bravais_tpu.spaces.h1 import H1Space
        n = args.n or 16
        p = args.p or 4
        lat = make_lattice("SQR")
        kp = kpath(lat, npts=args.nk)
        sp = H1Space.make(PeriodicGrid.make(lat, n), p)
        op = BlochHelmholtz(sp, dtype=jnp.complex64)
        solve_fn = (op.make_solve_fn(engine="spectral")
                    if args.engine == "spectral" else None)
        sweep = BandSweep(op, nev=args.nev, tol=args.tol,
                          maxiter=args.maxiter or 400,
                          solve_fn=solve_fn)
        metric = (f"k-point eigensolves/sec (2D square scalar Helmholtz, "
                  f"{args.nev} bands, eig tol {args.tol:g}, n={n} p={p})")
        mmax, mult = 5, 1

    # Nudge exact-Γ points (Maxwell only — the measure-zero harmonic
    # point of the quasi-periodic formulation, curlcurl docstring; the
    # scalar problem has no Γ issue and the nudge creates a needlessly
    # hard near-degenerate cold start).
    kc = kp.k_cart.copy()
    if args.problem == "maxwell":
        for i in range(kc.shape[0]):
            if np.linalg.norm(kc[i]) < 1e-12:
                kc[i] = 2e-2 * lat.B[0]

    t_all = time.time()
    res = (sweep.run_warm(kc) if args.mode == "warm"
           else sweep.run(kc, chunk=args.chunk or None))
    total = time.time() - t_all
    # Steady-state k-points: wall_s excludes the first launch (compile);
    # warm mode launches per k, batched mode per chunk.
    first = 1 if args.mode == "warm" else (args.chunk or kp.nk)
    n_steady = max(kp.nk - first, 1)
    solves_per_sec = n_steady / max(res.wall_s, 1e-9)

    # Accuracy vs the analytic empty-lattice oracle (App. B.3).
    def exact_bands(k, nb):
        vals = sorted(
            float(np.sum((np.asarray(k) + np.asarray(m) @ lat.B) ** 2))
            for m in itertools.product(range(-mmax, mmax + 1),
                                       repeat=lat.dim))
        return np.asarray(sorted(vals * mult)[:nb])

    errs = []
    for i in range(kp.nk):
        ex = exact_bands(kc[i], args.nev)
        errs.append(np.max(np.abs(res.eigenvalues[i] - ex))
                    / max(ex.max(), 1.0))

    # Secondary metrics (SURVEY.md §6): HBM footprint + achieved FLOP/s
    # of the compiled per-k solve program.
    mem = {}
    try:
        mem = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        pass
    flops_per_solve = None
    achieved_tflops = None
    hbm_program_bytes = None
    try:
        if args.mode == "warm" and sweep._jit_single is not None:
            rdtype = np.dtype(op.rdtype)
            X0 = jnp.asarray(sweep._x0_np(
                getattr(sp, "field_shape", sp.dof_shape), rdtype))
            compiled = (sweep._jit_single
                        .lower(X0, jnp.asarray(kc[0])).compile())
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            flops_per_solve = float(ca.get("flops", 0.0)) or None
            try:
                ma = compiled.memory_analysis()
                hbm_program_bytes = int(
                    ma.temp_size_in_bytes + ma.argument_size_in_bytes
                    + ma.output_size_in_bytes)
            except Exception:
                pass
        if flops_per_solve and res.wall_s > 0:
            achieved_tflops = (flops_per_solve * n_steady
                               / res.wall_s / 1e12)
    except Exception:
        pass
    out = {
        "metric": metric,
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
            "max_rel_eig_err_vs_analytic": float(np.max(errs)),
            "max_residual": float(np.max(res.residuals)),
            "engine": args.engine,
            "hbm_peak_bytes": mem.get("peak_bytes_in_use"),
            "hbm_program_bytes": hbm_program_bytes,
            "flops_per_eigensolve": flops_per_solve,
            "achieved_tflops": (round(achieved_tflops, 4)
                                if achieved_tflops else None),
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
