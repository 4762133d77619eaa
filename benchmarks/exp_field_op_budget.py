"""Measure the field-engine iteration/accuracy cost of CHEAPER
per-iteration components (CPU, f64 oracle):

* Chebyshev kernel-projector steps below the production
  ceil(2*sqrt(kappa)) (contraction 0.05): weaker contraction is
  non-amplifying by construction (residual poly bounded by 1 on the
  preconditioned spectrum), so the only risk is LOBPCG iteration
  inflation — measurable.
* Inner-PCG iterations of the (A+sM)^-1 preconditioner below the
  production 4: a weaker preconditioner, again only an iteration-count
  risk.

Each run reports LOBPCG iterations, refined-eigenvalue relative error
vs the complex128 dense deflated direct solve, and the f64 residual
certificate — at the production device stop (device_tol=1e-4).

    python benchmarks/exp_field_op_budget.py [--n 4] [--p 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--p", type=int, default=2)
    ap.add_argument("--nev", type=int, default=5)
    ap.add_argument("--block", type=int, default=9)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from bravais_tpu.bands import BandSweep
    from bravais_tpu.lattices import make_lattice
    from bravais_tpu.meshing.grid import PeriodicGrid
    from bravais_tpu.operators.coefficients import dielectric_sphere
    from bravais_tpu.operators.curlcurl import BlochCurlCurl
    from bravais_tpu.spaces.nedelec import NedelecSpace

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_maxwell_bands import _dense_deflated_dielectric

    lat = make_lattice("CUB")
    grid = PeriodicGrid.make(lat, args.n)
    center = 0.5 * lat.A.sum(axis=0)
    k = np.asarray(lat.k_cart((0.5, 0.0, 0.0)), np.float32)

    def one(eps_in, dense_vals, sp, eps, cheby=None, inner=None):
        op = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex64)
        tag = []
        if cheby is not None:
            op.cheby_steps = lambda: cheby        # instance override
            tag.append(f"cheby={cheby}")
        if inner is not None:
            base = type(op).fd_precond_cg
            op.fd_precond_cg = (
                lambda kk, shift=None, inner_iters=None, ii=inner:
                base(op, kk, shift=shift, inner_iters=ii))
            tag.append(f"inner={inner}")
        solve = op.make_solve_fn(deflation="project-cheby",
                                 precond="fastdiag-cg")
        sweep = BandSweep(op, nev=args.nev, block=args.block,
                          tol=1e-6, maxiter=250, solve_fn=solve,
                          device_tol=1e-4)
        t0 = time.time()
        res = sweep.run(np.asarray([k]))
        rel = (np.abs(res.eigenvalues[0] - dense_vals)
               / np.abs(dense_vals))
        print(f"  {' '.join(tag) or 'production':16s}"
              f"  iters={int(res.iterations[0]):3d}"
              f"  rel_err={rel.max():.3e}"
              f"  f64_res={np.max(res.residuals):.3e}"
              f"  wall={time.time() - t0:6.1f}s", flush=True)

    for eps_in in (13.0, 30.0):
        eps = dielectric_sphere(eps_in, 1.0, 0.25, center, lat.A, 0.0)
        sp = NedelecSpace.make(grid, args.p)
        op64 = BlochCurlCurl(sp, eps=eps, dtype=jnp.complex128)
        dense_vals = _dense_deflated_dielectric(
            sp, op64, np.asarray(k, np.float64), args.nev)
        prod = BlochCurlCurl(sp, eps=eps,
                             dtype=jnp.complex64).cheby_steps()
        print(f"eps={eps_in:g}: production cheby_steps={prod}",
              flush=True)
        one(eps_in, dense_vals, sp, eps)                 # control
        for s in (6, 5, 4, 3):
            if s < prod:
                one(eps_in, dense_vals, sp, eps, cheby=s)
        for ii in (3, 2):
            one(eps_in, dense_vals, sp, eps, inner=ii)
        one(eps_in, dense_vals, sp, eps, cheby=5, inner=3)


if __name__ == "__main__":
    main()
