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
    build_csremap(force=True)
    return conservative_weights("ll2cs", n_lat=24, n_lon=48, n_cs=16)


@pytest.fixture(scope="module")
def cs2ll():
    return conservative_weights("cs2ll", n_lat=24, n_lon=48, n_cs=16)


def _ll_areas(nlat, nlon):
    edges = -np.pi / 2 + np.arange(nlat + 1) * np.pi / nlat
    return np.repeat((np.sin(edges[1:]) - np.sin(edges[:-1])) * 2 * np.pi / nlon, nlon)


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

    def test_header_truncated_cache_regenerates(self, tmp_path):
        """Round 5: a crash can cut the cache file INSIDE the fixed-size
        header, which raises struct.error (not ValueError) — the corrupt-
        cache recovery must still regenerate rather than stay poisoned."""
        w1 = conservative_weights(
            "ll2cs", n_lat=12, n_lon=24, n_cs=8, samples=4, cache_dir=tmp_path
        )
        (cache,) = list(tmp_path.glob("csremap_*.bin"))
        cache.write_bytes(cache.read_bytes()[:10])  # mid-header cut
        w2 = conservative_weights(
            "ll2cs", n_lat=12, n_lon=24, n_cs=8, samples=4, cache_dir=tmp_path
        )
        np.testing.assert_array_equal(w1.vals, w2.vals)


class TestExactClipping:
    """The exact spherical-overlap method (TempestRemap-equivalent,
    VERDICT r1 #7): conservation to machine precision, both grid kinds."""

    @pytest.mark.parametrize(
        "ncs,nlat,nlon,centered",
        [
            (4, 8, 16, True),
            (8, 16, 32, True),
            (16, 25, 48, False),
            # awkward coarse/odd gratings: CS edge arcs bulge far over the
            # latitude clip boundaries here, exercising the single-segment
            # LENS case the clip engine used to silently drop
            (3, 7, 9, True),
            (5, 6, 11, False),
            (6, 10, 13, True),
        ],
    )
    def test_exact_conservation_machine_precision(
        self, tmp_path, ncs, nlat, nlon, centered
    ):
        w = conservative_weights(
            "ll2cs", n_lat=nlat, n_lon=nlon, n_cs=ncs,
            lat_centered=centered, cache_dir=tmp_path, dtype=np.float64,
        )
        cs = CubedSphere(ncs)
        A_t = np.asarray(cs.cell_areas).reshape(-1).astype(np.float64)
        # row sums exactly 1
        np.testing.assert_allclose(w.row_sums(), 1.0, atol=1e-14)
        # column sums of overlap areas == source-cell areas (exactness: the
        # pair areas partition BOTH grids simultaneously)
        A_pair = w.vals * A_t[w.rows]
        colsum = np.zeros(w.shape[1])
        np.add.at(colsum, w.cols, A_pair)
        if centered:
            A_s = _ll_areas(nlat, nlon)
        else:
            edges = np.clip(
                -np.pi / 2 + (np.arange(nlat + 1) - 0.5) * np.pi / (nlat - 1),
                -np.pi / 2, np.pi / 2,
            )
            A_s = np.repeat(
                (np.sin(edges[1:]) - np.sin(edges[:-1])) * 2 * np.pi / nlon, nlon
            )
        np.testing.assert_allclose(colsum, A_s, rtol=1e-12, atol=1e-15)
        # total overlap area == 4 pi
        assert abs(A_pair.sum() - 4 * np.pi) < 1e-12
        # global integral of any field is preserved exactly
        rng = np.random.default_rng(0)
        f = rng.normal(size=w.shape[1])
        tgt = np.zeros(w.shape[0])
        np.add.at(tgt, w.rows, w.vals * f[w.cols])
        assert abs((A_s * f).sum() - (A_t * tgt).sum()) < 1e-12

    def test_exact_vs_sampled_agree_to_first_order(self, tmp_path):
        we = conservative_weights(
            "ll2cs", n_lat=16, n_lon=32, n_cs=8, cache_dir=tmp_path
        )
        ws = conservative_weights(
            "ll2cs", n_lat=16, n_lon=32, n_cs=8, method="sampled", samples=16,
            cache_dir=tmp_path,
        )
        lats, lons = latlon_grid(16, 32)
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        src = _smooth(glat, glon).reshape(1, -1)
        d = we.apply_numpy(src) - ws.apply_numpy(src)
        assert np.abs(d).max() < 0.01

    def test_cs2ll_exact_transpose_consistency(self, tmp_path):
        # both directions come from the same pair areas: W_cs2ll recovers
        # the same overlap matrix as W_ll2cs (scaled by the other side)
        wa = conservative_weights(
            "ll2cs", n_lat=8, n_lon=16, n_cs=4, cache_dir=tmp_path,
            dtype=np.float64,
        )
        wb = conservative_weights(
            "cs2ll", n_lat=8, n_lon=16, n_cs=4, cache_dir=tmp_path,
            dtype=np.float64,
        )
        cs = CubedSphere(4)
        A_cs = np.asarray(cs.cell_areas).reshape(-1).astype(np.float64)
        A_ll = _ll_areas(8, 16)
        pa = {}
        for r, c, v in zip(wa.rows, wa.cols, wa.vals):
            pa[(int(r), int(c))] = v * A_cs[r]
        for r, c, v in zip(wb.rows, wb.cols, wb.vals):
            np.testing.assert_allclose(
                v * A_ll[r], pa[(int(c), int(r))], rtol=1e-11
            )


def test_clip_engine_selftest():
    """The binary's built-in clip self-test: a latitude clip of a quad whose
    top great arc bulges poleward must keep the LENS (single-kept-segment
    case) — areas partition to machine precision (pre-fix code dropped it:
    defect 1.36e-2 sr, verified)."""
    import subprocess

    from dlwp_cs_tpu.remap.native import build_csremap

    binary = build_csremap()
    r = subprocess.run(
        [str(binary), "--selftest-clip"], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr
    assert "PASS" in r.stderr
