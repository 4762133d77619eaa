"""Domain-decomposition tests (SURVEY.md §2.3 row 1, §2.4): one
k-point's operator state sharded across devices.

The rebuild's DD is declarative: dof arrays get a NamedSharding over a
device mesh axis, and XLA's SPMD partitioner turns the periodic
reshape/roll gathers into halo exchanges (collective-permute) and the
Gram reductions into psums — replacing hypre's ParCSR comm package.
These tests run on 8 virtual CPU devices (§4.2 item 4) and verify the
sharded results match the single-device ones bit-for-bit-ish."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bravais_tpu.eigen.lobpcg import lobpcg
from bravais_tpu.eigen.precond import jacobi
from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.curlcurl import BlochCurlCurl
from bravais_tpu.operators.helmholtz import BlochHelmholtz
from bravais_tpu.spaces.h1 import H1Space
from bravais_tpu.spaces.nedelec import NedelecSpace


def _mesh():
    assert jax.device_count() >= 8
    return Mesh(np.asarray(jax.devices()[:8]), ("x",))


def test_sharded_helmholtz_apply_matches():
    lat = make_lattice("SQR")
    sp = H1Space.make(PeriodicGrid.make(lat, 8), 2)  # N1 = 16 = 8*2
    op = BlochHelmholtz(sp, dtype=jnp.complex128)
    k = jnp.asarray(lat.k_cart((0.31, 0.17)))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(sp.dof_shape)
                    + 1j * rng.standard_normal(sp.dof_shape))
    ref = np.asarray(jax.jit(op.apply_A)(u, k))

    mesh = _mesh()
    shard = NamedSharding(mesh, P("x", None))  # split first dof axis
    us = jax.device_put(u, shard)
    f = jax.jit(op.apply_A, in_shardings=(shard, None),
                out_shardings=shard)
    out = f(us, k)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12,
                               atol=1e-13)


def test_sharded_curlcurl_apply_matches():
    lat = make_lattice("FCC")
    sp = NedelecSpace.make(PeriodicGrid.make(lat, 4), 2)  # N1 = 8
    op = BlochCurlCurl(sp, dtype=jnp.complex128)
    k = jnp.asarray(lat.k_cart((0.5, 0.25, 0.75)))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(sp.field_shape)
                    + 1j * rng.standard_normal(sp.field_shape))
    ref = np.asarray(jax.jit(op.apply_A)(u, k))

    mesh = _mesh()
    shard = NamedSharding(mesh, P(None, "x", None, None))
    f = jax.jit(op.apply_A, in_shardings=(shard, None),
                out_shardings=shard)
    out = f(jax.device_put(u, shard), k)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12,
                               atol=1e-12)


def test_sharded_eigensolve_matches():
    """Full LOBPCG with the dof axis sharded: Grams become psums; the
    result must match the unsharded solve (same algorithm, same
    arithmetic up to reduction order)."""
    lat = make_lattice("SQR")
    sp = H1Space.make(PeriodicGrid.make(lat, 8), 2)
    op = BlochHelmholtz(sp, dtype=jnp.complex128)
    k = jnp.asarray(lat.k_cart((0.31, 0.17)))
    rng = np.random.default_rng(2)
    m = 6
    X0 = jnp.asarray(rng.standard_normal((m,) + sp.dof_shape)
                     + 1j * rng.standard_normal((m,) + sp.dof_shape))

    def solve(X0):
        r = lobpcg(lambda x: op.apply_A(x, k), op.apply_M, X0, 3,
                   maxiter=150, tol=1e-9, precond=jacobi(op.diag_A(k)))
        return r.eigenvalues, r.iterations

    ref_vals, ref_its = jax.jit(solve)(X0)

    mesh = _mesh()
    shard = NamedSharding(mesh, P(None, "x", None))  # (m, N1, N2)
    f = jax.jit(solve, in_shardings=(shard,))
    vals, its = f(jax.device_put(X0, shard))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-9)
