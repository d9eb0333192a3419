"""Remap tests: conservation (row sums), round-trip accuracy, JAX/numpy parity
(SURVEY.md §4.6)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.remap import (
    RemapWeights,
    apply_remap,
    cs_to_ll_weights,
    from_faces,
    latlon_grid,
    ll_to_cs_weights,
    remap_cs_to_ll,
    remap_ll_to_cs,
    to_faces,
)


def _smooth(lat, lon):
    # A polynomial in (x, y, z): genuinely smooth everywhere on the sphere.
    # (Beware lat-lon-separable forms like sin(lat)*cos(2*lon): they are
    # singular at the poles and produce spurious "remap errors" there.)
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    return x * y + 0.5 * z * z - 0.3 * y * z + 0.2 * x


class TestWeights:
    def test_row_sums_one(self):
        cs = CubedSphere(16)
        lats, lons = latlon_grid(24, 48)
        for w in (ll_to_cs_weights(lats, lons, cs), cs_to_ll_weights(cs, lats, lons)):
            np.testing.assert_allclose(w.row_sums(), 1.0, atol=1e-6)

    def test_ll_to_cs_accuracy(self):
        cs = CubedSphere(24)
        lats, lons = latlon_grid(46, 90)
        w = ll_to_cs_weights(lats, lons, cs)
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        src = _smooth(glat, glon)
        tgt = w.apply_numpy(src.reshape(1, -1)).reshape(6, 24, 24)
        clat, clon = cs.cell_latlon
        truth = _smooth(clat, clon)
        assert np.abs(tgt - truth).max() < 0.01

    def test_cs_to_ll_accuracy(self):
        cs = CubedSphere(32)
        lats, lons = latlon_grid(32, 64)
        w = cs_to_ll_weights(cs, lats, lons)
        clat, clon = cs.cell_latlon
        src = _smooth(clat, clon)
        tgt = w.apply_numpy(src.reshape(1, -1)).reshape(32, 64)
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        truth = _smooth(glat, glon)
        assert np.abs(tgt - truth).max() < 0.02

    def test_roundtrip_converges(self):
        # LL -> CS -> LL error on a smooth field shrinks with resolution.
        errs = {}
        for n, h in ((12, 24), (24, 48)):
            cs = CubedSphere(n)
            lats, lons = latlon_grid(h, 2 * h)
            fwd = ll_to_cs_weights(lats, lons, cs)
            inv = cs_to_ll_weights(cs, lats, lons)
            glat, glon = np.meshgrid(lats, lons, indexing="ij")
            src = _smooth(glat, glon)
            cycled = inv.apply_numpy(
                fwd.apply_numpy(src.reshape(1, -1))
            ).reshape(h, 2 * h)
            # exclude pole rows (clamped extrapolation region)
            errs[n] = np.abs(cycled - src)[2:-2].max()
        assert errs[24] < 0.6 * errs[12]

    def test_save_load(self, tmp_path):
        cs = CubedSphere(8)
        lats, lons = latlon_grid(12, 24)
        w = ll_to_cs_weights(lats, lons, cs)
        p = w.save(tmp_path / "w.npz")
        back = RemapWeights.load(p)
        np.testing.assert_array_equal(back.rows, w.rows)
        np.testing.assert_array_equal(back.vals, w.vals)
        assert back.shape == w.shape


class TestApply:
    def test_jax_matches_numpy(self):
        cs = CubedSphere(12)
        lats, lons = latlon_grid(18, 36)
        w = ll_to_cs_weights(lats, lons, cs)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 18 * 36)).astype(np.float32)
        ref = w.apply_numpy(x)
        out = np.asarray(apply_remap(w, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_integer_field_not_truncated(self):
        """Round 5: weights must never be cast to an int input dtype —
        bilinear weights in (0,1) truncate to 0 and an int field (e.g. a
        land-sea mask) silently remaps to all zeros."""
        cs = CubedSphere(12)
        lats, lons = latlon_grid(18, 36)
        w = ll_to_cs_weights(lats, lons, cs)
        ones = np.ones((1, 18 * 36), np.int32)
        out = np.asarray(apply_remap(w, jnp.asarray(ones)))
        np.testing.assert_allclose(out, 1.0, atol=1e-5)
        ref = w.apply_numpy(ones)
        np.testing.assert_allclose(ref, 1.0, atol=1e-5)

    def test_shaped_wrappers(self):
        cs = CubedSphere(8)
        lats, lons = latlon_grid(12, 24)
        fwd = ll_to_cs_weights(lats, lons, cs)
        inv = cs_to_ll_weights(cs, lats, lons)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 12, 24)))
        cube = remap_ll_to_cs(fwd, x, 8)
        assert cube.shape == (2, 6, 8, 8)
        back = remap_cs_to_ll(inv, cube, 12, 24)
        assert back.shape == (2, 12, 24)

    def test_faces_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 6 * 5 * 5)))
        f = to_faces(x, 5)
        assert f.shape == (4, 6, 5, 5)
        np.testing.assert_array_equal(np.asarray(from_faces(f)), np.asarray(x))
        with pytest.raises(ValueError):
            to_faces(x, 4)
