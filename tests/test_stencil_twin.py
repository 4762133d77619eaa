"""Shrunken-twin stencil extraction (grid.stencil_twin).

FastDiag stencils are element-local: with the SAME element Jacobian,
the same 1D tables, and element-invariant (constant) coefficients, the
k=0 neighbor-coupling blocks S_δ extracted on a 3-per-axis twin grid
equal the production grid's exactly — while probing costs O((3/n)^d)
of the production applies (measured at n=8 p=4 Nédélec: the full
A+M+G bundle builds in ~6.5 s vs ~22 s for the production-grid "A"
stencil ALONE; the disk-cache cold path drops from minutes to seconds).
These tests gate the parity that makes the shortcut safe.
"""

import numpy as np
import jax.numpy as jnp

from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.curlcurl import BlochCurlCurl
from bravais_tpu.operators.fastdiag import (extract_stencil,
                                            extract_stencil_rect)
from bravais_tpu.operators.qplaplace import QPLaplace
from bravais_tpu.spaces.h1 import H1Space
from bravais_tpu.spaces.nedelec import NedelecSpace


def test_stencil_twin_same_jacobian():
    lat = make_lattice("FCC")
    g = PeriodicGrid.make(lat, (5, 4, 6))
    t = g.stencil_twin()
    assert t.shape == (3, 3, 3)
    np.testing.assert_allclose(t.J, g.J, rtol=1e-14, atol=1e-15)
    np.testing.assert_allclose(t.Ginv, g.Ginv, rtol=1e-13, atol=1e-15)
    # reciprocal convention preserved: b_i . a_j = 2 pi delta_ij
    np.testing.assert_allclose(t.lattice.B @ t.lattice.A.T,
                               2 * np.pi * np.eye(3), atol=1e-12)


def test_stencil_twin_parity_nedelec():
    """A, M, and rectangular G stencils on FCC (non-orthogonal J)."""
    lat = make_lattice("FCC")
    g = PeriodicGrid.make(lat, 5)
    sp = NedelecSpace.make(g, 2)
    op = BlochCurlCurl(sp, eps=1.7, mu_inv=0.8, dtype=jnp.complex128)
    g3 = g.stencil_twin()
    op3 = BlochCurlCurl(NedelecSpace.make(g3, 2, sp.q), eps=1.7,
                        mu_inv=0.8, dtype=jnp.complex128)
    k0 = np.zeros(3)
    for name, fn in (("A", "apply_A_np"), ("M", "apply_M_np")):
        S = extract_stencil(lambda u: getattr(op, fn)(u, k0), 3,
                            g.shape, 2)
        S3 = extract_stencil(lambda u: getattr(op3, fn)(u, k0), 3,
                             g3.shape, 2)
        np.testing.assert_allclose(S3, S, rtol=0,
                                   atol=1e-13 * np.abs(S).max()), name
    G = extract_stencil_rect(lambda u: op.apply_Gk_np(u, k0), 3, 1,
                             g.shape, 2)
    G3 = extract_stencil_rect(lambda u: op3.apply_Gk_np(u, k0), 3, 1,
                              g3.shape, 2)
    np.testing.assert_allclose(G3, G, rtol=0, atol=1e-13)


def test_stencil_twin_parity_h1_anisotropic():
    """Anisotropic 2D rectangular lattice + anisotropic element count:
    the twin must reproduce the per-axis element geometry."""
    lat = make_lattice("RECT", a=1.0, b=0.7)
    g = PeriodicGrid.make(lat, (6, 4))
    h = H1Space.make(g, 3)
    qa = QPLaplace(h, alpha=2.5, dtype=jnp.complex128)
    gt = g.stencil_twin()
    qat = QPLaplace(H1Space.make(gt, 3, h.q), alpha=2.5,
                    dtype=jnp.complex128)
    k0 = np.zeros(2)
    L = extract_stencil(lambda u: qa.apply_A_np(u, k0), 1, g.shape, 3)
    L3 = extract_stencil(lambda u: qat.apply_A_np(u, k0), 1, gt.shape, 3)
    np.testing.assert_allclose(L3, L, rtol=0,
                               atol=1e-13 * np.abs(L).max())


def test_fastdiag_builders_use_twin_and_match_oracle(monkeypatch):
    """End-to-end: the production fastdiag builders (curl-curl A/M/G)
    run through the twin path (cache disabled so extraction really
    happens) and the resulting block factorization still reproduces
    the operator exactly: matvec through blocks == direct apply."""
    monkeypatch.setenv("BRAVAIS_STENCIL_CACHE", "")
    lat = make_lattice("CUB")
    g = PeriodicGrid.make(lat, 4)
    sp = NedelecSpace.make(g, 2)
    op = BlochCurlCurl(sp, dtype=jnp.complex128)
    fd = op.fastdiag_G()
    # the twin actually shrank
    assert op._fd_twin.space.grid.shape == (3, 3, 3)
    k = 0.3 * lat.B[0] + 0.1 * lat.B[1]
    rng = np.random.default_rng(0)
    u = rng.standard_normal((3,) + sp.field_shape[1:]) \
        + 1j * rng.standard_normal((3,) + sp.field_shape[1:])
    y_blocks = np.asarray(fd.matvec([("A", 1.0)], jnp.asarray(k))(
        jnp.asarray(u)))
    y_direct = op.apply_A_np(u, k)
    np.testing.assert_allclose(y_blocks, y_direct, rtol=1e-10,
                               atol=1e-10 * np.abs(y_direct).max())
