"""Geometry property tests: the topology oracles of SURVEY.md Appendix A."""

import numpy as np
import pytest

from dlwp_cs_tpu.geometry import (
    EDGE_E,
    EDGE_N,
    EDGE_S,
    EDGE_W,
    CubedSphere,
    EdgeLink,
    edge_table,
    face_xyz,
    insolation,
    verify_edge_table,
    xyz_to_face_angles,
)

# Hand-derived expected connectivity (independent cross-check of the numeric
# derivation; computed from the face_xyz chart table by hand).
_EXPECTED = {
    (0, EDGE_S): EdgeLink(5, EDGE_N, False),
    (0, EDGE_N): EdgeLink(4, EDGE_S, False),
    (0, EDGE_W): EdgeLink(3, EDGE_E, False),
    (0, EDGE_E): EdgeLink(1, EDGE_W, False),
    (1, EDGE_S): EdgeLink(5, EDGE_E, True),
    (1, EDGE_N): EdgeLink(4, EDGE_E, False),
    (1, EDGE_W): EdgeLink(0, EDGE_E, False),
    (1, EDGE_E): EdgeLink(2, EDGE_W, False),
    (2, EDGE_S): EdgeLink(5, EDGE_S, True),
    (2, EDGE_N): EdgeLink(4, EDGE_N, True),
    (2, EDGE_W): EdgeLink(1, EDGE_E, False),
    (2, EDGE_E): EdgeLink(3, EDGE_W, False),
    (3, EDGE_S): EdgeLink(5, EDGE_W, False),
    (3, EDGE_N): EdgeLink(4, EDGE_W, True),
    (3, EDGE_W): EdgeLink(2, EDGE_E, False),
    (3, EDGE_E): EdgeLink(0, EDGE_W, False),
    (4, EDGE_S): EdgeLink(0, EDGE_N, False),
    (4, EDGE_N): EdgeLink(2, EDGE_N, True),
    (4, EDGE_W): EdgeLink(3, EDGE_N, True),
    (4, EDGE_E): EdgeLink(1, EDGE_N, False),
    (5, EDGE_S): EdgeLink(2, EDGE_S, True),
    (5, EDGE_N): EdgeLink(0, EDGE_S, False),
    (5, EDGE_W): EdgeLink(3, EDGE_S, False),
    (5, EDGE_E): EdgeLink(1, EDGE_S, True),
}


def test_edge_table_matches_hand_derivation():
    table = edge_table()
    for (f, e), expected in _EXPECTED.items():
        assert table[f][e] == expected, f"face {f} edge {e}"


@pytest.mark.parametrize("n", [2, 3, 8, 24, 48])
def test_edge_table_verifies_at_resolution(n):
    verify_edge_table(n)


def test_cell_areas_sum_to_sphere():
    cs = CubedSphere(24)
    assert np.isclose(cs.cell_areas.sum(), 4 * np.pi, rtol=1e-12)
    # Near-equal-area: equiangular CS max/min area ratio is modest (~1.3).
    ratio = cs.cell_areas.max() / cs.cell_areas.min()
    assert 1.0 < ratio < 1.5


def test_cell_centers_unit_norm_and_distinct():
    cs = CubedSphere(8)
    p = cs.cell_xyz.reshape(-1, 3)
    assert np.allclose(np.linalg.norm(p, axis=-1), 1.0)
    # All 6*n*n centers distinct (no face overlap/duplication).
    d = np.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1)
    d[np.arange(len(p)), np.arange(len(p))] = 1.0
    assert d.min() > 1e-6


def test_chart_roundtrip():
    cs = CubedSphere(12)
    face, a, b = xyz_to_face_angles(cs.cell_xyz)
    expect_face = np.broadcast_to(np.arange(6)[:, None, None], (6, 12, 12))
    assert np.array_equal(face, expect_face)
    ang = cs.center_angles
    assert np.allclose(a, np.broadcast_to(ang[None, None, :], (6, 12, 12)), atol=1e-12)
    assert np.allclose(b, np.broadcast_to(ang[None, :, None], (6, 12, 12)), atol=1e-12)


def test_all_faces_right_handed_outward():
    # du x dv must point outward on every face: the chirality invariant that
    # lets one polar kernel serve both poles without a flip.
    eps = 1e-6
    for f in range(6):
        p0 = face_xyz(f, 0.1, -0.2)
        du = face_xyz(f, 0.1 + eps, -0.2) - p0
        dv = face_xyz(f, 0.1, -0.2 + eps) - p0
        cross = np.cross(du, dv)
        assert np.dot(cross, p0) > 0, f"face {f} is left-handed"


def test_equatorial_eta_points_north():
    eps = 1e-6
    for f in range(4):
        p0 = face_xyz(f, 0.0, 0.0)
        dv = face_xyz(f, 0.0, eps) - p0
        assert dv[2] > 0, f"face {f}: +eta is not northward"


def test_latlon_ranges():
    cs = CubedSphere(16)
    lat, lon = cs.cell_latlon
    assert lat.min() >= -np.pi / 2 and lat.max() <= np.pi / 2
    assert lon.min() >= 0 and lon.max() < 2 * np.pi
    # polar faces contain the extremal latitudes
    assert lat[4].max() == lat.max() and lat[5].min() == lat.min()


class TestInsolation:
    def test_nonnegative_and_bounded(self):
        cs = CubedSphere(8)
        lat, lon = cs.cell_latlon
        s = np.asarray(insolation(123.45, lat, lon))
        assert (s >= 0).all()
        assert s.max() < 1450.0  # S0 * max distance factor

    def test_night_side_dark(self):
        # At epoch (Jan 1, 00 UTC) local midnight is near lon 0 -> dark there,
        # and local noon near lon 180 -> lit (mid latitudes).
        s_mid = np.asarray(insolation(0.0, np.array(0.0), np.array(0.0)))
        s_noon = np.asarray(insolation(0.0, np.array(0.0), np.array(np.pi)))
        assert s_mid == 0.0
        assert s_noon > 1000.0

    def test_polar_night_and_day(self):
        # Early January: south pole in polar day, north pole in polar night.
        for frac in [0.0, 0.25, 0.5, 0.75]:
            north = np.asarray(insolation(3.0 + frac, np.array(1.55), np.array(0.0)))
            south = np.asarray(insolation(3.0 + frac, np.array(-1.55), np.array(0.0)))
            assert north == 0.0
            assert south > 400.0

    def test_seasonal_cycle(self):
        # Equator noon irradiance peaks near equinoxes vs solstices.
        lat = np.array(0.0)
        days = {
            "mar_equinox": 79.0,
            "jun_solstice": 172.0,
        }
        noon = {
            k: float(np.max(np.asarray(insolation(d + np.linspace(0, 1, 97), lat, np.array(0.0)))))
            for k, d in days.items()
        }
        assert noon["mar_equinox"] > noon["jun_solstice"]

    def test_broadcast_time_axis(self):
        cs = CubedSphere(4)
        lat, lon = cs.cell_latlon
        t = np.arange(3, dtype=np.float64).reshape(3, 1, 1, 1)
        s = np.asarray(insolation(t, lat, lon))
        assert s.shape == (3, 6, 4, 4)
