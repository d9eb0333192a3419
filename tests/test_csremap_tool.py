"""C++ conservative remap tool: build, run, conservation + accuracy
(SURVEY.md §4.6); cross-checks the C++ geometry against the Python contract."""

import shutil

import numpy as np
import pytest

from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.remap import latlon_grid
from dlwp_cs_tpu.remap.native import build_csremap, conservative_weights

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("make") is None,
    reason="no C++ toolchain",
)


def _smooth(lat, lon):
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    return x * y + 0.5 * z * z - 0.3 * y * z + 0.2 * x


@pytest.fixture(scope="module")
def ll2cs():
    build_csremap()
    return conservative_weights("ll2cs", n_lat=24, n_lon=48, n_cs=16, samples=6)


@pytest.fixture(scope="module")
def cs2ll():
    return conservative_weights("cs2ll", n_lat=24, n_lon=48, n_cs=16, samples=6)


class TestConservativeWeights:
    def test_row_sums_exactly_one(self, ll2cs, cs2ll):
        np.testing.assert_allclose(ll2cs.row_sums(), 1.0, atol=1e-12)
        np.testing.assert_allclose(cs2ll.row_sums(), 1.0, atol=1e-12)

    def test_shapes(self, ll2cs, cs2ll):
        assert ll2cs.shape == (6 * 16 * 16, 24 * 48)
        assert cs2ll.shape == (24 * 48, 6 * 16 * 16)

    def test_ll2cs_accuracy_on_smooth_field(self, ll2cs):
        cs = CubedSphere(16)
        lats, lons = latlon_grid(24, 48)
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        src = _smooth(glat, glon)
        tgt = ll2cs.apply_numpy(src.reshape(1, -1)).reshape(6, 16, 16)
        clat, clon = cs.cell_latlon
        truth = _smooth(clat, clon)
        # first-order conservative: cell-average vs center value, O(h)
        assert np.abs(tgt - truth).max() < 0.08
        assert np.abs(tgt - truth).mean() < 0.02

    def test_cs2ll_accuracy_on_smooth_field(self, cs2ll):
        cs = CubedSphere(16)
        lats, lons = latlon_grid(24, 48)
        clat, clon = cs.cell_latlon
        src = _smooth(clat, clon)
        tgt = cs2ll.apply_numpy(src.reshape(1, -1)).reshape(24, 48)
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        truth = _smooth(glat, glon)
        assert np.abs(tgt - truth).max() < 0.08

    def test_global_mean_conservation(self, ll2cs):
        # Conservative remap of a constant is exactly constant; global area
        # mean of a smooth field is preserved to first order.
        cs = CubedSphere(16)
        lats, lons = latlon_grid(24, 48)
        const = np.full((1, 24 * 48), 2.5)
        out = ll2cs.apply_numpy(const)
        np.testing.assert_allclose(out, 2.5, atol=1e-12)
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        src = _smooth(glat, glon)
        src_mean = (src * np.cos(glat)).sum() / np.cos(glat).sum()
        tgt = ll2cs.apply_numpy(src.reshape(1, -1)).reshape(6, 16, 16)
        w = cs.cell_areas
        tgt_mean = (tgt * w).sum() / w.sum()
        assert abs(tgt_mean - src_mean) < 5e-3

    def test_cache_reuse(self, tmp_path):
        w1 = conservative_weights(
            "ll2cs", n_lat=12, n_lon=24, n_cs=8, samples=4, cache_dir=tmp_path
        )
        w2 = conservative_weights(
            "ll2cs", n_lat=12, n_lon=24, n_cs=8, samples=4, cache_dir=tmp_path
        )
        np.testing.assert_array_equal(w1.vals, w2.vals)
