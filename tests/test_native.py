"""Native host core (C++ via ctypes) vs the NumPy dense oracles."""

import numpy as np
import pytest

from bravais_tpu.lattices import make_lattice
from bravais_tpu.meshing.grid import PeriodicGrid
from bravais_tpu.operators import dense
from bravais_tpu.operators.coefficients import dielectric_rod
from bravais_tpu.spaces.h1 import H1Space
from bravais_tpu.spaces.nedelec import NedelecSpace
from bravais_tpu.utils import native

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("lat,shape,p,k", [
    ("SQR", (3, 3), 2, (0.7, -0.3)),
    ("HEX2D", (2, 3), 3, (0.0, 0.0)),
    ("FCC", (2, 2, 2), 2, (0.5, 0.2, -0.9)),
])
def test_native_h1_matches_numpy(lat, shape, p, k):
    lattice = make_lattice(lat)
    sp = H1Space.make(PeriodicGrid.make(lattice, shape), p)
    eps = (dielectric_rod(8.9, 1.0, 0.2, 0.5 * lattice.A.sum(0), lattice.A)
           if lattice.dim == 2 else 1.0)
    A0, M0 = dense.assemble_h1(sp, np.asarray(k), alpha=1.0, beta=eps)
    An, Mn = native.assemble_h1(sp, np.asarray(k), alpha=1.0, beta=eps)
    np.testing.assert_allclose(An, A0, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(Mn, M0, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("lat,shape,p,k", [
    ("CUB", (2, 2, 2), 1, (0.4, -0.7, 0.2)),
    ("FCC", (2, 2, 2), 2, (0.5, 0.25, 0.75)),
])
def test_native_nedelec_matches_numpy(lat, shape, p, k):
    lattice = make_lattice(lat)
    sp = NedelecSpace.make(PeriodicGrid.make(lattice, shape), p)
    kc = lattice.k_cart(k)
    A0, M0 = dense.assemble_nedelec(sp, kc)
    An, Mn = native.assemble_nedelec(sp, kc)
    np.testing.assert_allclose(An, A0, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(Mn, M0, rtol=1e-12, atol=1e-12)


def test_native_dof_map():
    lattice = make_lattice("SQR")
    sp = H1Space.make(PeriodicGrid.make(lattice, (3, 2)), 2)
    gm = native.h1_dof_map(sp)
    assert gm.shape == (6, 9)
    # wrap: element (2, 1) local (2, 2) -> global ((2*2+2)%6, (1*2+2)%4)=(0,0)
    assert gm[-1, -1] == 0
    assert gm.min() == 0 and gm.max() == sp.ndofs - 1
