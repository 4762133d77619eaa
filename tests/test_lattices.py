"""Lattice-data unit tests (SURVEY.md §4.2 item 1)."""

import numpy as np
import pytest

from bravais_tpu.lattices import (LATTICE_NAMES, LATTICE_NAMES_2D, kpath,
                                  make_lattice)

ALL_NAMES = LATTICE_NAMES + LATTICE_NAMES_2D

# Parameter sets that exercise every S&C variant.
VARIANT_CASES = [
    ("CUB", {}), ("FCC", {}), ("BCC", {}), ("TET", {}),
    ("BCT", {"c": 0.8}), ("BCT", {"c": 1.3}),
    ("ORC", {}),
    ("ORCF", {"a": 0.6, "b": 1.2, "c": 1.4}),   # 1/a^2 > 1/b^2+1/c^2 -> ORCF1
    ("ORCF", {"a": 1.1, "b": 1.2, "c": 1.4}),   # ORCF2
    ("ORCI", {}), ("ORCC", {}), ("HEX", {}),
    ("RHL", {"alpha": np.deg2rad(60)}), ("RHL", {"alpha": np.deg2rad(110)}),
    ("MCL", {}), ("MCLC", {}),
    ("TRI", {"alpha": np.deg2rad(65), "beta": np.deg2rad(70),
             "gamma": np.deg2rad(75)}),
    ("TRI", {"alpha": np.deg2rad(105), "beta": np.deg2rad(110),
             "gamma": np.deg2rad(115)}),
    ("SQR", {}), ("RECT", {}), ("CRECT", {}), ("HEX2D", {}), ("OBL", {}),
]


@pytest.mark.parametrize("name,kw", VARIANT_CASES,
                         ids=[f"{n}-{i}" for i, (n, _) in
                              enumerate(VARIANT_CASES)])
def test_reciprocal_duality(name, kw):
    lat = make_lattice(name, **kw)
    # b_i . a_j = 2 pi delta_ij  (SURVEY.md §4.2)
    np.testing.assert_allclose(lat.B @ lat.A.T, 2 * np.pi * np.eye(lat.dim),
                               atol=1e-12)
    assert lat.cell_volume > 0


@pytest.mark.parametrize("name,kw", VARIANT_CASES,
                         ids=[f"{n}-{i}" for i, (n, _) in
                              enumerate(VARIANT_CASES)])
def test_path_points_defined(name, kw):
    lat = make_lattice(name, **kw)
    for sub in lat.path:
        assert len(sub) >= 2
        for lab in sub:
            assert lab in lat.points
    # Gamma is always present and at the origin.
    np.testing.assert_allclose(lat.points["G"], 0.0, atol=0)


def test_sc_point_tables():
    """Spot-check S&C fractional coordinates (SURVEY.md App. A tables)."""
    fcc = make_lattice("FCC")
    np.testing.assert_allclose(fcc.points["X"], [0.5, 0, 0.5])
    np.testing.assert_allclose(fcc.points["W"], [0.5, 0.25, 0.75])
    np.testing.assert_allclose(fcc.points["K"], [0.375, 0.375, 0.75])
    np.testing.assert_allclose(fcc.points["L"], [0.5, 0.5, 0.5])
    cub = make_lattice("CUB")
    np.testing.assert_allclose(cub.points["R"], [0.5, 0.5, 0.5])
    bcc = make_lattice("BCC")
    np.testing.assert_allclose(bcc.points["P"], [0.25, 0.25, 0.25])
    sq = make_lattice("SQR")
    np.testing.assert_allclose(sq.points["M"], [0.5, 0.5])


def test_cartesian_symmetry_points_cubic():
    """For CUB with lattice constant a, X = (0, pi/a, 0) etc."""
    a = 2.0
    lat = make_lattice("CUB", a=a)
    np.testing.assert_allclose(lat.point_cart("X"), [0, np.pi / a, 0],
                               atol=1e-12)
    np.testing.assert_allclose(lat.point_cart("R"),
                               [np.pi / a, np.pi / a, np.pi / a], atol=1e-12)
    # FCC: X should be (2pi/a)(0,1,0)-type point, |X| = 2 pi / a.
    fcc = make_lattice("FCC", a=a)
    assert np.isclose(np.linalg.norm(fcc.point_cart("X")), 2 * np.pi / a)
    # L = (pi/a)(1,1,1)
    np.testing.assert_allclose(np.abs(fcc.point_cart("L")),
                               np.pi / a * np.ones(3), atol=1e-12)


def test_variant_dispatch():
    assert make_lattice("BCT", c=0.8).variant == "BCT1"
    assert make_lattice("BCT", c=1.3).variant == "BCT2"
    assert make_lattice("ORCF", a=0.6, b=1.2, c=1.4).variant == "ORCF1"
    assert make_lattice("ORCF", a=1.1, b=1.2, c=1.4).variant == "ORCF2"
    assert make_lattice("RHL", alpha=np.deg2rad(60)).variant == "RHL1"
    assert make_lattice("RHL", alpha=np.deg2rad(110)).variant == "RHL2"
    # Obtuse direct angles -> acute reciprocal angles -> TRI1b branch.
    assert make_lattice("TRI", alpha=np.deg2rad(105), beta=np.deg2rad(110),
                        gamma=np.deg2rad(115)).variant in ("TRI1b", "TRI2b")
    assert make_lattice("MCLC").variant.startswith("MCLC")


def test_aliases():
    assert make_lattice("simple_cubic").name == "CUB"
    assert make_lattice("square").name == "SQR"
    with pytest.raises(ValueError):
        make_lattice("nope")


@pytest.mark.parametrize("name,kw", VARIANT_CASES[:8])
def test_kpath_sampling(name, kw):
    lat = make_lattice(name, **kw)
    kp = kpath(lat, npts=60)
    assert kp.nk >= 60
    # Distances are monotone non-decreasing and continuous within segments.
    assert np.all(np.diff(kp.dist) >= -1e-14)
    # Each tick label sits on the matching symmetry point (possibly merged).
    for idx, lab in kp.labels:
        lab0 = lab.split("|")[0]
        np.testing.assert_allclose(
            kp.k_cart[idx], lat.point_cart(lab0), atol=1e-12)
    # k_frac and k_cart agree through the reciprocal basis.
    np.testing.assert_allclose(kp.k_frac @ lat.B, kp.k_cart, atol=1e-12)


def test_kpath_custom_headline():
    """The headline FCC Γ–X–W–L path (BASELINE.json:5)."""
    lat = make_lattice("FCC")
    kp = kpath(lat, npts=32, path=[["G", "X", "W", "L"]])
    labs = [lab for _, lab in kp.labels]
    assert labs == ["G", "X", "W", "L"]
    np.testing.assert_allclose(kp.k_cart[0], 0.0, atol=0)


def test_kpath_segment_structure():
    lat = make_lattice("CUB")
    kp = kpath(lat, npts=50)
    assert len(kp.segments) == len(lat.path)
    total = sum(b - a for a, b in kp.segments)
    assert total == kp.nk
