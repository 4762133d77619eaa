"""Fused Pallas H1 apply kernel vs the einsum reference (interpret
mode on CPU; the compiled path is exercised on real TPU by bench/verify
runs — SURVEY.md §7.1 step 9)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.helmholtz import BlochHelmholtz
from bravais_tpu.spaces.h1 import H1Space


@pytest.mark.parametrize("lat,shape,p", [
    ("SQR", (4, 4), 2), ("HEX2D", (3, 4), 3),
    ("FCC", (3, 3, 3), 2), ("CUB", (2, 2, 2), 3),
])
def test_pallas_apply_matches_einsum(lat, shape, p):
    lattice = make_lattice(lat)
    sp = H1Space.make(PeriodicGrid.make(lattice, shape), p)
    op = BlochHelmholtz(sp, alpha=lambda x: 1 + 0.3 * x[..., 0] ** 2,
                        beta=lambda x: 1 + np.sum(x ** 2, axis=-1),
                        dtype=jnp.complex64)
    rng = np.random.default_rng(0)
    u = jnp.asarray((rng.standard_normal(sp.dof_shape)
                     + 1j * rng.standard_normal(sp.dof_shape)
                     ).astype(np.complex64))
    k = jnp.asarray(lattice.k_cart([0.3] * sp.dim), jnp.float32)
    y, m = op.apply_AM_pallas(u, k, interpret=True)
    yr = op.apply_A(u, k)
    mr = op.apply_M(u)
    assert float(jnp.linalg.norm(y - yr) / jnp.linalg.norm(yr)) < 5e-7
    assert float(jnp.linalg.norm(m - mr) / jnp.linalg.norm(mr)) < 5e-7


def test_pallas_qplaplace_matches(monkeypatch):
    """The same fused kernel serves the quasi-periodic (deflation)
    Laplacian with shift — k=0 in-kernel, phases in the outer gather."""
    from bravais_tpu.operators.qplaplace import QPLaplace
    from bravais_tpu.meshing.grid import PeriodicGrid

    lattice = make_lattice("FCC")
    sp = H1Space.make(PeriodicGrid.make(lattice, 4), 2)
    op = QPLaplace(sp, alpha=lambda x: 1 + np.sum(x ** 2, -1), beta=2.0,
                   shift=3.5, dtype=jnp.complex64)
    rng = np.random.default_rng(0)
    u = jnp.asarray((rng.standard_normal(sp.dof_shape)
                     + 1j * rng.standard_normal(sp.dof_shape)
                     ).astype(np.complex64))
    k = jnp.asarray(lattice.k_cart((0.3, 0.2, 0.1)), jnp.float32)
    y_ref = op.apply_A(u, k)
    y_pal = op.apply_A(u, k, interpret=True, force_pallas=True)
    assert float(jnp.linalg.norm(y_pal - y_ref)
                 / jnp.linalg.norm(y_ref)) < 5e-7


@pytest.mark.parametrize("lat,n,p", [("FCC", 3, 2), ("CUB", 3, 1),
                                     ("HEX", 3, 3)])
def test_pallas_nedelec_matches_stacked(lat, n, p):
    """Fused Nédélec (A, M) kernel vs the stacked einsum path
    (interpret mode; varying ε/μ to exercise the coefficient planes)."""
    from bravais_tpu.operators.curlcurl import BlochCurlCurl
    from bravais_tpu.spaces.nedelec import NedelecSpace

    lattice = make_lattice(lat)
    sp = NedelecSpace.make(PeriodicGrid.make(lattice, n), p)
    op = BlochCurlCurl(sp, eps=lambda x: 1 + 0.4 * x[..., 0] ** 2,
                       mu_inv=lambda x: 1 + 0.2 * np.sum(x ** 2, axis=-1),
                       dtype=jnp.complex64)
    rng = np.random.default_rng(1)
    u = jnp.asarray((rng.standard_normal(sp.field_shape)
                     + 1j * rng.standard_normal(sp.field_shape)
                     ).astype(np.complex64))
    k = jnp.asarray(lattice.k_cart([0.3, 0.2, 0.1]), jnp.float32)
    y, m = op.apply_AM_pallas(u, k, interpret=True)
    y_ref = op.apply_A(u, k)
    m_ref = op.apply_M(u, k)
    tol = 2e-5
    assert float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref)) < tol
    assert float(jnp.linalg.norm(m - m_ref) / jnp.linalg.norm(m_ref)) < tol
