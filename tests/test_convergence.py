"""Discretization convergence-order checks (SURVEY.md §4.2 item 3:
"convergence-order checks"): empty-lattice eigenvalue error must decay
at the spectral-element rate O(h^{2p}) under h-refinement, for both the
H1 scalar and the Nédélec Maxwell discretizations."""

import numpy as np
import pytest
import scipy.linalg

from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.dense import assemble_h1
from bravais_tpu.spaces.h1 import H1Space
from tests.oracles.analytic import scalar_bands


def _h1_err(lat, n, p, k, nb=4):
    sp = H1Space.make(PeriodicGrid.make(lat, n), p)
    A, M = assemble_h1(sp, k)
    vals = scipy.linalg.eigh(A, M, eigvals_only=True)[:nb]
    ex = scalar_bands(lat, k, nb, mmax=4)
    # band 1 is exact (constant envelope); measure bands 2..nb
    return float(np.max(np.abs(vals[1:] - ex[1:]) / ex[1:]))


@pytest.mark.parametrize("p,order_floor", [(1, 1.6), (2, 3.5), (3, 5.2)])
def test_h1_eigenvalue_convergence_order(p, order_floor):
    lat = make_lattice("SQR")
    k = lat.k_cart((0.21, 0.13))
    e1 = _h1_err(lat, 4, p, k)
    e2 = _h1_err(lat, 8, p, k)
    order = np.log2(e1 / e2)
    assert order > order_floor, (p, e1, e2, order)


def test_nedelec_eigenvalue_convergence_order():
    """Maxwell p=2: h-refinement 3→6 must show ~2p-order eigenvalue
    decay (via the exact twisted-DFT block spectrum — the discrete
    eigenvalues of the full operator, no solver error)."""
    import jax.numpy as jnp
    from bravais_tpu.operators.curlcurl import BlochCurlCurl
    from bravais_tpu.spaces.nedelec import NedelecSpace
    from tests.oracles.analytic import maxwell_bands

    lat = make_lattice("CUB")
    k = np.asarray(lat.k_cart((0.21, 0.13, 0.17)))
    errs = []
    for n in (3, 6):
        sp = NedelecSpace.make(PeriodicGrid.make(lat, n), 2)
        op = BlochCurlCurl(sp, dtype=jnp.complex128)
        fd = op.fastdiag_G()
        # exact discrete spectrum of every block, f64
        sup = np.ones((1, fd.nblocks))  # all blocks are candidates
        lam, _ = op.spectral_refine_np(sup, k, 6, topk=fd.nblocks,
                                       tau=0.0)
        ex = maxwell_bands(lat, k, 6, mmax=3)
        errs.append(float(np.max(np.abs(lam - ex) / ex)))
    order = np.log2(errs[0] / errs[1])
    assert order > 3.4, (errs, order)
