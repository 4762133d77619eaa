"""All-lattice sweep (BASELINE config 5 capability core): empty-lattice
scalar bands must match the analytic oracle on EVERY 3D Bravais lattice
family and every 2D lattice — validates metric/Jacobian handling for
arbitrarily oblique cells (SURVEY.md §4.2 item 3)."""

import numpy as np
import pytest
import scipy.linalg

from bravais_tpu.lattices import LATTICE_NAMES, LATTICE_NAMES_2D, \
    make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators.dense import assemble_h1
from bravais_tpu.spaces.h1 import H1Space
from tests.oracles.analytic import scalar_bands

PARAMS = {
    "BCT": {"c": 0.8}, "ORCF": {"a": 0.9, "b": 1.1, "c": 1.3},
    "RHL": {"alpha": np.deg2rad(70)},
    "TRI": {"alpha": np.deg2rad(80), "beta": np.deg2rad(85),
            "gamma": np.deg2rad(75)},
}


@pytest.mark.parametrize("name", LATTICE_NAMES)
def test_empty_lattice_bands_3d(name):
    lat = make_lattice(name, **PARAMS.get(name, {}))
    kf = np.array([0.21, 0.13, 0.17])
    k = lat.k_cart(kf)
    sp = H1Space.make(PeriodicGrid.make(lat, 4), 2)
    A, M = assemble_h1(sp, k)
    vals = scipy.linalg.eigh(A, M, eigvals_only=True)[:3]
    exact = scalar_bands(lat, k, 3, mmax=4)
    # Coarse mesh: few-% discretization accuracy is the gate here; the
    # point is the metric/oblique-cell correctness across families.
    np.testing.assert_allclose(vals, exact, rtol=5e-2)
    # Band 1 (constant envelope) is exact in the shifted formulation.
    np.testing.assert_allclose(vals[0], exact[0], rtol=1e-10)


@pytest.mark.parametrize("name", LATTICE_NAMES_2D)
def test_empty_lattice_bands_2d(name):
    lat = make_lattice(name)
    kf = np.array([0.21, 0.13])
    k = lat.k_cart(kf)
    sp = H1Space.make(PeriodicGrid.make(lat, 5), 2)
    A, M = assemble_h1(sp, k)
    vals = scipy.linalg.eigh(A, M, eigvals_only=True)[:3]
    exact = scalar_bands(lat, k, 3, mmax=5)
    np.testing.assert_allclose(vals, exact, rtol=2e-2)
    np.testing.assert_allclose(vals[0], exact[0], rtol=1e-10)
