"""Tensor-product space / gather-scatter unit tests (SURVEY.md §4.2 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.spaces import tensor
from bravais_tpu.spaces.basis1d import (gauss_nodes, gll_nodes,
                                        lagrange_eval, make_closed_basis)
from bravais_tpu.spaces.h1 import H1Space


def _space(lat_name="SQR", shape=3, p=2, **kw):
    lat = make_lattice(lat_name, **kw)
    return H1Space.make(PeriodicGrid.make(lat, shape), p)


# -- 1D bases ---------------------------------------------------------------

@pytest.mark.parametrize("p", [1, 2, 3, 4, 6])
def test_gll_nodes(p):
    x = gll_nodes(p)
    assert x.shape == (p + 1,)
    assert np.isclose(x[0], 0) and np.isclose(x[-1], 1)
    assert np.all(np.diff(x) > 0)
    # Symmetric about 1/2.
    np.testing.assert_allclose(x + x[::-1], 1.0, atol=1e-14)


@pytest.mark.parametrize("q", [1, 2, 5, 8])
def test_gauss_quadrature_exactness(q):
    x, w = gauss_nodes(q)
    # Exact for polynomials of degree <= 2q-1 on [0, 1].
    for deg in range(2 * q):
        np.testing.assert_allclose(np.sum(w * x ** deg), 1 / (deg + 1),
                                   rtol=1e-13)


@pytest.mark.parametrize("p", [1, 2, 4])
def test_lagrange_basis_properties(p):
    nodes = gll_nodes(p)
    B, D = lagrange_eval(nodes, nodes)
    np.testing.assert_allclose(B, np.eye(p + 1), atol=1e-12)  # cardinality
    x, _ = gauss_nodes(p + 2)
    B, D = lagrange_eval(nodes, x)
    # Partition of unity and its derivative.
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(D.sum(axis=1), 0.0, atol=1e-11)
    # Degree-p polynomial reproduction incl. derivative.
    c = np.linspace(0.7, 1.3, p + 1)
    vals = np.polyval(c, nodes)
    np.testing.assert_allclose(B @ vals, np.polyval(c, x), rtol=1e-11)
    np.testing.assert_allclose(D @ vals,
                               np.polyval(np.polyder(c), x), rtol=1e-10)


def test_lagrange_eval_at_node_derivative():
    # Derivative branch when evaluation point coincides with a node.
    nodes = gll_nodes(3)
    _, Dn = lagrange_eval(nodes, nodes)
    c = np.array([0.3, -1.0, 2.0, 0.5])
    np.testing.assert_allclose(Dn @ np.polyval(c, nodes),
                               np.polyval(np.polyder(c), nodes), rtol=1e-10)


# -- gather / scatter -------------------------------------------------------

@pytest.mark.parametrize("lat,shape,p", [
    ("SQR", (3, 4), 2), ("CUB", (2, 3, 2), 1), ("FCC", (2, 2, 2), 3),
    ("SQR", (1, 3), 2),  # n=1 direction: self-periodic wrap
])
def test_gather_scatter_adjoint(lat, shape, p):
    sp = _space(lat, shape, p)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(sp.dof_shape)
                    + 1j * rng.standard_normal(sp.dof_shape))
    ue = sp.gather(u)
    v = jnp.asarray(rng.standard_normal(ue.shape)
                    + 1j * rng.standard_normal(ue.shape))
    lhs = jnp.vdot(v, ue)
    rhs = jnp.vdot(sp.scatter_add(jnp.conj(v)).conj(), u)
    # <v, gather(u)> == <scatter(v), u>  (exact adjoint)
    np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-13)


def test_gather_periodic_wrap():
    sp = _space("SQR", (3, 3), 2)
    u = jnp.arange(np.prod(sp.dof_shape), dtype=jnp.float64
                   ).reshape(sp.dof_shape)
    ue = np.asarray(sp.gather(u))
    n, p = 3, 2
    # Element (e1, e2): local (j1, j2) = global ((e1*p+j1) % 6, ...)
    for e1, e2, j1, j2 in [(0, 0, 0, 0), (2, 1, 2, 1), (2, 2, 2, 2),
                           (1, 2, 0, 2)]:
        g1, g2 = (e1 * p + j1) % (n * p), (e2 * p + j2) % (n * p)
        assert ue[e1, j1, e2, j2] == np.asarray(u)[g1, g2]


def test_contract_polynomial_reproduction():
    """Tensor interpolation reproduces degree-p polynomials per element."""
    p, q, d = 3, 5, 2
    b = make_closed_basis(p, q)
    rng = np.random.default_rng(1)
    cx = rng.standard_normal(p + 1)
    cy = rng.standard_normal(p + 1)
    # One 'element' with local dofs = nodal values of f(x)g(y).
    vals = np.outer(np.polyval(cx, b.nodes), np.polyval(cy, b.nodes))
    ue = jnp.asarray(vals.reshape(1, p + 1, 1, p + 1))
    uq = np.asarray(tensor.contract(ue, [jnp.asarray(b.B)] * d))
    expect = np.outer(np.polyval(cx, b.qpts), np.polyval(cy, b.qpts))
    np.testing.assert_allclose(uq[0, :, 0, :], expect, rtol=1e-11)


def test_partition_of_unity_on_grid():
    sp = _space("HEX2D", (3, 3), 3)
    u = jnp.ones(sp.dof_shape)
    uq = tensor.contract(sp.gather(u), [jnp.asarray(sp.basis.B)] * 2)
    np.testing.assert_allclose(np.asarray(uq), 1.0, atol=1e-13)


# -- space bookkeeping ------------------------------------------------------

@pytest.mark.parametrize("lat,shape,p,expect", [
    ("SQR", (4, 4), 1, 16), ("SQR", (4, 4), 3, 144),
    ("CUB", (2, 2, 2), 2, 64), ("FCC", (3, 2, 2), 1, 12),
])
def test_dof_counts(lat, shape, p, expect):
    sp = _space(lat, shape, p)
    assert sp.ndofs == expect  # (n_i p)_i dofs (SURVEY.md App. C.1)


def test_mass_integral_equals_volume():
    """sum_j (M 1)_j = cell volume — partition of unity + quadrature."""
    from bravais_tpu.operators.helmholtz import BlochHelmholtz
    for lat_name, shape in [("SQR", (3, 3)), ("FCC", (2, 2, 2)),
                            ("HEX", (2, 2, 2))]:
        lat = make_lattice(lat_name)
        sp = H1Space.make(PeriodicGrid.make(lat, shape), 2)
        op = BlochHelmholtz(sp, dtype=jnp.complex128)
        total = jnp.sum(op.apply_M(jnp.ones(sp.dof_shape))).real
        np.testing.assert_allclose(float(total), lat.cell_volume, rtol=1e-12)


def test_qpoints_phys_layout():
    lat = make_lattice("SQR", a=2.0)
    sp = H1Space.make(PeriodicGrid.make(lat, (2, 3)), 2)
    xq = sp.qpoints_phys()
    assert xq.shape == (2, sp.q, 3, sp.q, 2)
    # First element's first qpt lies inside the first element box.
    assert 0 < xq[0, 0, 0, 0, 0] < 1.0
    # Last element's last qpt near the far corner.
    assert xq[1, -1, 2, -1, 0] < 2.0
