"""Data pipeline tests: store, series windowing, prefetch, preprocessing."""

import numpy as np
import pytest

import jax.numpy as jnp

from dlwp_cs_tpu.data import (
    MemoryStore,
    Preprocessor,
    SeriesDataset,
    insolation_stats,
    open_store,
    prefetch_to_device,
    write_store,
)
from dlwp_cs_tpu.geometry import CubedSphere, insolation
from dlwp_cs_tpu.models import DataConfig

N = 6
T = 40
CVAR = 2


def _store(t=T, seed=0, constants=True):
    rng = np.random.default_rng(seed)
    fields = rng.normal(size=(t, 6, N, N, CVAR)).astype(np.float32) * 5 + 3
    times = np.arange(t) * 0.25  # 6-hourly
    consts = rng.normal(size=(6, N, N, 2)).astype(np.float32) if constants else None
    return MemoryStore.from_raw(
        fields,
        times,
        ("z500", "z1000"),
        constants=consts,
        constant_names=("topo", "lsm") if constants else (),
    )


def _dataset(store=None, **kw):
    store = store or _store()
    cs = CubedSphere(N)
    lat, lon = cs.cell_latlon
    cfg = kw.pop(
        "cfg",
        DataConfig(
            grid_n=N,
            variables=("z500", "z1000"),
            input_time_steps=2,
            output_time_steps=2,
            add_insolation=True,
            constants=("topo", "lsm"),
        ),
    )
    return SeriesDataset(store, cfg, lat=lat, lon=lon, batch_size=4, **kw)


class TestStore:
    def test_from_raw_stats(self):
        s = _store()
        assert s.mean.shape == (CVAR,)
        assert np.all(s.std > 0)
        assert s.grid_n == N

    def test_h5_roundtrip(self, tmp_path):
        s = _store()
        p = write_store(tmp_path / "store.h5", s)
        back = open_store(p)
        np.testing.assert_array_equal(np.asarray(back.fields), s.fields)
        np.testing.assert_array_equal(back.times, s.times)
        assert back.variables == s.variables
        np.testing.assert_array_equal(back.constants, s.constants)
        m = back.load()
        assert isinstance(m, MemoryStore)
        back.close()

    def test_partially_nan_channel_stats_and_impute(self):
        # sst-over-land analog: NaNs in one channel must not NaN its stats,
        # and impute=True must fill ONLY the masked cells (with the valid-cell
        # mean, i.e. 0 after normalization), not zero the whole channel.
        rng = np.random.default_rng(5)
        fields = rng.normal(size=(T, 6, N, N, CVAR)).astype(np.float32) * 5 + 3
        mask = rng.random((6, N, N)) < 0.3
        fields[:, mask, 1] = np.nan
        s = MemoryStore.from_raw(fields, np.arange(T) * 0.25, ("z500", "sst"))
        assert np.all(np.isfinite(s.mean)) and np.all(np.isfinite(s.std))
        valid = fields[..., 1][~np.isnan(fields[..., 1])]
        np.testing.assert_allclose(s.mean[1], valid.mean(), rtol=1e-5)
        np.testing.assert_allclose(s.std[1], valid.std(), rtol=1e-4)
        ds = _dataset(
            s,
            cfg=DataConfig(
                grid_n=N,
                variables=("z500", "sst"),
                input_time_steps=2,
                output_time_steps=2,
                add_insolation=False,
            ),
            impute=True,
        )
        x, y = next(iter(ds))
        assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
        # valid cells keep real (non-zero) normalized values
        sst_in = x[..., 1::CVAR][:, ~mask]
        assert float(np.abs(sst_in).max()) > 0.5
        # masked cells are exactly the fill value 0
        assert np.all(x[..., 1::CVAR][:, mask] == 0.0)

    def test_minmax_scaler(self):
        rng = np.random.default_rng(8)
        fields = rng.uniform(200, 300, size=(10, 6, N, N, 1)).astype(np.float32)
        s = MemoryStore.from_raw(fields, np.arange(10.0), ("t",), scaler="minmax")
        assert s.attrs["scaler"] == "minmax"
        normed = (fields - s.mean) / s.std
        assert normed.min() == pytest.approx(0.0, abs=1e-6)
        assert normed.max() == pytest.approx(1.0, abs=1e-6)
        with pytest.raises(ValueError):
            MemoryStore.from_raw(fields, np.arange(10.0), ("t",), scaler="bogus")

    def test_robust_scaler(self):
        # median/IQR normalization: immune to a gross outlier that would
        # wreck min/max (and shift mean/std)
        rng = np.random.default_rng(8)
        fields = rng.normal(0.0, 2.0, size=(10, 6, N, N, 1)).astype(np.float32)
        fields[0, 0, 0, 0, 0] = 1e6  # one bad value
        s = MemoryStore.from_raw(fields, np.arange(10.0), ("t",), scaler="robust")
        assert s.attrs["scaler"] == "robust"
        q25, q50, q75 = np.percentile(fields.astype(np.float64), [25, 50, 75])
        assert s.mean[0] == pytest.approx(q50, rel=1e-6)
        assert s.std[0] == pytest.approx(q75 - q25, rel=1e-6)
        normed = (fields - s.mean) / s.std
        # the bulk lands at O(1) scale despite the outlier
        assert abs(np.median(normed)) < 1e-6
        assert np.percentile(normed, 75) - np.percentile(normed, 25) == (
            pytest.approx(1.0, rel=1e-6))

    def test_maxabs_scaler(self):
        # sklearn MaxAbsScaler parity: x / max|x|, zero center preserved
        rng = np.random.default_rng(12)
        fields = rng.normal(0.0, 5.0, size=(10, 6, N, N, 2)).astype(np.float32)
        s = MemoryStore.from_raw(fields, np.arange(10.0), ("u", "v"),
                                 scaler="maxabs")
        assert s.attrs["scaler"] == "maxabs"
        assert np.all(s.mean == 0.0)
        normed = (fields - s.mean) / s.std
        assert np.abs(normed).max() == pytest.approx(1.0, abs=1e-6)
        # sign structure untouched (no centering)
        assert np.all(np.sign(normed) == np.sign(fields))

    def test_cell_mean_impute(self):
        # a masked cell gets ITS OWN time-mean, not the channel mean
        rng = np.random.default_rng(9)
        fields = rng.normal(size=(T, 6, N, N, CVAR)).astype(np.float32) * 3 + 10
        # cell (0, 1, 2): high local mean, masked at some times
        fields[:, 0, 1, 2, 1] = 50.0 + rng.normal(size=T)
        masked_t = np.arange(0, T, 3)
        truth_mean = fields[:, 0, 1, 2, 1][
            ~np.isin(np.arange(T), masked_t)
        ].mean()
        fields[masked_t, 0, 1, 2, 1] = np.nan
        s = MemoryStore.from_raw(fields, np.arange(T) * 0.25, ("a", "b"))
        ds = _dataset(
            s,
            cfg=DataConfig(
                grid_n=N,
                variables=("a", "b"),
                input_time_steps=2,
                output_time_steps=2,
                add_insolation=False,
            ),
            impute="cell_mean",
        )
        x, y = ds.make_batch(np.asarray(masked_t[:2]))  # windows hitting NaNs
        assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
        # the filled value de-normalizes to the cell's valid-time mean
        got = x[0, 0, 1, 2, 1] * s.std[1] + s.mean[1]
        assert got == pytest.approx(truth_mean, rel=0.02)

    def test_all_nan_channel_degrades_gracefully(self):
        fields = np.full((10, 6, N, N, 1), np.nan, np.float32)
        s = MemoryStore.from_raw(fields, np.arange(10.0), ("dead",))
        assert s.mean[0] == 0.0 and s.std[0] == 1.0

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            MemoryStore.from_raw(
                np.zeros((4, 5, N, N, 1), np.float32), np.arange(4), ("x",)
            )


class TestSeriesDataset:
    def test_batch_shapes_and_channel_count(self):
        ds = _dataset()
        x, y = next(iter(ds))
        assert x.shape == (4, 6, N, N, 2 * CVAR + 2 + 2)
        assert y.shape == (4, 6, N, N, 2 * CVAR)
        assert x.dtype == np.float32

    def test_normalization_applied(self):
        ds = _dataset()
        x, y = next(iter(ds))
        # normalized prognostic channels should be ~N(0,1), raw were ~N(3,5)
        assert abs(float(x[..., :CVAR].mean())) < 0.5
        assert 0.5 < float(x[..., :CVAR].std()) < 2.0

    def test_targets_shifted_from_inputs(self):
        store = _store()
        ds = _dataset(store)
        x, y = ds.make_batch(np.array([0]))
        # target t0 channel equals normalized store field at index 2
        expect = (store.fields[2] - store.mean) / store.std
        np.testing.assert_allclose(
            y[0, ..., :CVAR], expect.astype(np.float32), rtol=1e-5, atol=1e-5
        )
        # input t0 = store index 0, t1 = index 1 (time-major folding)
        expect0 = (store.fields[0] - store.mean) / store.std
        np.testing.assert_allclose(
            x[0, ..., :CVAR], expect0.astype(np.float32), rtol=1e-5, atol=1e-5
        )

    def test_insolation_channels_match_formula(self):
        store = _store()
        ds = _dataset(store)
        x, _ = ds.make_batch(np.array([5]))
        cs = CubedSphere(N)
        lat, lon = cs.cell_latlon
        t0 = store.times[5]
        ins = (np.asarray(insolation(t0, lat, lon, xp=np)) - ds.insol_mean) / ds.insol_std
        np.testing.assert_allclose(x[0, ..., 2 * CVAR], ins, rtol=1e-4, atol=1e-4)

    def test_interval_subsampling(self):
        store = _store()
        ds = _dataset(store, interval=2)
        x, y = ds.make_batch(np.array([0]))
        expect = (store.fields[4] - store.mean) / store.std  # first target at idx 4
        np.testing.assert_allclose(
            y[0, ..., :CVAR], expect.astype(np.float32), rtol=1e-5, atol=1e-5
        )
        assert ds.dt_days == pytest.approx(0.5)

    def test_shuffle_determinism_and_coverage(self):
        ds1 = _dataset(shuffle=True, seed=7)
        ds2 = _dataset(shuffle=True, seed=7)
        b1 = [x.sum() for x, _ in ds1]
        b2 = [x.sum() for x, _ in ds2]
        np.testing.assert_allclose(b1, b2)

    def test_len_and_drop_remainder(self):
        ds = _dataset(drop_remainder=True)
        n_batches = len(ds)
        assert n_batches == ds.n_samples // 4
        assert len(list(iter(ds))) == n_batches

    def test_too_short_store_rejected(self):
        with pytest.raises(ValueError):
            _dataset(_store(t=3))

    def test_missing_constant_rejected(self):
        cfg = DataConfig(
            grid_n=N,
            variables=("z500", "z1000"),
            constants=("glacier_mask",),
        )
        with pytest.raises(ValueError):
            _dataset(cfg=cfg)

    def test_h5_backed_dataset(self, tmp_path):
        p = write_store(tmp_path / "s.h5", _store())
        back = open_store(p)
        ds = _dataset(back)
        x, y = next(iter(ds))
        assert np.isfinite(x).all() and np.isfinite(y).all()
        back.close()

    def test_insolation_stats_sane(self):
        cs = CubedSphere(N)
        lat, lon = cs.cell_latlon
        m, s = insolation_stats(lat, lon)
        # global annual mean TOA insolation is ~ S0/4 ~ 340 W/m2
        assert 300 < m < 380
        assert 300 < s < 500

    def test_prenormalized_cache_matches_raw(self, tmp_path):
        """normalize_store + SeriesDataset auto-detect: identical batches
        to the raw-store path without the per-batch normalization pass
        (round-5 training-cache feature), through BOTH writers."""
        from dlwp_cs_tpu.data import (
            normalize_store,
            open_store,
            write_store,
        )

        store = _store(t=16)
        cs = CubedSphere(N)
        lat, lon = cs.cell_latlon
        cfg = DataConfig(
            grid_n=N, variables=("z500", "t2m"), constants=("topo",)
        )
        common = dict(lat=lat, lon=lon, batch_size=3)
        raw_ds = SeriesDataset(store, cfg, **common)
        norm = normalize_store(store)
        assert normalize_store(norm) is norm  # idempotent
        path = write_store(tmp_path / "norm.h5", norm)
        h5 = open_store(path)
        cached_ds = SeriesDataset(h5, cfg, **common)
        assert cached_ds.prenormalized and not cached_ds.scale
        xa, ya = raw_ds.make_batch(raw_ds._starts[:3])
        xb, yb = cached_ds.make_batch(cached_ds._starts[:3])
        np.testing.assert_allclose(xa, xb, atol=1e-6)
        np.testing.assert_allclose(ya, yb, atol=1e-6)
        h5.close()

    def test_parallel_assembly_matches_serial(self):
        """workers>1 delivers bit-identical batches in the serial order
        (round-5 input-pipeline fix — PERF.md)."""
        store = _store(t=20)
        cs = CubedSphere(N)
        lat, lon = cs.cell_latlon
        cfg = DataConfig(grid_n=N, variables=("z500", "t2m"), constants=())
        common = dict(lat=lat, lon=lon, batch_size=4, shuffle=True, seed=11)
        serial = SeriesDataset(store, cfg, **common)
        threaded = SeriesDataset(store, cfg, workers=3, **common)
        got = list(threaded)
        want = list(serial)
        assert len(got) == len(want) > 0
        for (xa, ya), (xb, yb) in zip(want, got):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)


class TestPrefetch:
    def test_order_and_device(self):
        batches = [(np.full((2, 2), i), np.full((2,), i)) for i in range(5)]
        out = list(prefetch_to_device(iter(batches), depth=2))
        assert len(out) == 5
        for i, (x, y) in enumerate(out):
            assert isinstance(x, jnp.ndarray)
            assert float(x[0, 0]) == i

    def test_error_propagates(self):
        def gen():
            yield (np.zeros(2),)
            raise RuntimeError("boom")

        it = prefetch_to_device(gen(), depth=1)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            for _ in it:
                pass

    def test_close_depth1_releases_worker(self):
        """Round 5: at depth=1, close() used to race the worker's
        just-unblocked put — the refilled single-slot queue left the
        finally-clause sentinel put blocked forever (leaked thread +
        pinned device batch)."""
        import time

        from dlwp_cs_tpu.data.prefetch import PrefetchIterator

        for _ in range(5):  # the race needs a few shots
            it = PrefetchIterator(
                iter([(np.full((2,), i),) for i in range(50)]), depth=1
            )
            next(it)  # worker now blocked in put() of the next batch
            it.close()
            deadline = time.monotonic() + 10.0
            while it._thread.is_alive() and time.monotonic() < deadline:
                time.sleep(0.01)
            assert not it._thread.is_alive(), "prefetch worker leaked"
            with pytest.raises(StopIteration):
                next(it)  # exhausted-iterator contract survives close()


class TestPreprocessor:
    def test_end_to_end_store_build(self, tmp_path):
        h, w, t = 19, 36, 8
        lats = -np.pi / 2 + (np.arange(h) + 0.5) * np.pi / h
        lons = (np.arange(w) + 0.5) * 2 * np.pi / w
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        base = np.sin(glat)[None] * np.cos(glon)[None]
        sources = {
            "z500": base * np.ones((t, 1, 1)) + 5.0,
            "t2m": base * 2.0 * np.ones((t, 1, 1)),
        }
        topo = np.cos(glat)
        pre = Preprocessor(sources, lats, lons, np.arange(t) * 0.25)
        store = pre.data_to_series(
            8,
            constant_sources={"topography": topo},
            path=tmp_path / "cs.h5",
        )
        assert store.fields.shape == (t, 6, 8, 8, 2)
        assert store.constant_names == ("topography",)
        # smooth field sampled on CS should stay within source range
        assert store.fields[..., 0].min() > 3.9
        assert store.fields[..., 0].max() < 6.1
        assert (tmp_path / "cs.h5").exists()

    def test_derived_variables_stream(self):
        # the papers' thickness workflow: tau = z300 - z700, computed per
        # streamed batch, remapped identically to a pre-computed source
        h, w, t = 19, 36, 9
        lats = -np.pi / 2 + (np.arange(h) + 0.5) * np.pi / h
        lons = (np.arange(w) + 0.5) * 2 * np.pi / w
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        rngf = np.random.default_rng(0)
        z300 = (np.sin(glat)[None] + 0.1 * rngf.normal(size=(t, h, w))).astype(
            np.float32
        )
        z700 = (np.cos(glon)[None] + 0.1 * rngf.normal(size=(t, h, w))).astype(
            np.float32
        )
        pre = Preprocessor(
            {"z300": z300, "z700": z700},
            lats, lons, np.arange(t) * 0.25,
            derived={"tau300-700": (("z300", "z700"), lambda a, b: a - b)},
        )
        store = pre.data_to_series(8, batch_size=4)  # forces 3 batches
        assert store.variables == ("z300", "z700", "tau300-700")
        # linearity of the remap: tau channel == z300 ch - z700 ch exactly
        np.testing.assert_allclose(
            store.fields[..., 2],
            store.fields[..., 0] - store.fields[..., 1],
            atol=1e-5,
        )
        # explicit selection of only the derived variable works too
        solo = pre.data_to_series(8, variables=["tau300-700"])
        np.testing.assert_allclose(
            solo.fields[..., 0], store.fields[..., 2], atol=1e-6
        )

    def test_bad_inputs(self):
        lats = np.linspace(-1.5, 1.5, 4)
        lons = np.linspace(0, 6, 8)
        with pytest.raises(ValueError):
            Preprocessor({}, lats, lons, np.arange(3))
        with pytest.raises(ValueError):
            Preprocessor(
                {"x": np.zeros((3, 5, 8))}, lats, lons, np.arange(3)
            )
        pre = Preprocessor({"x": np.zeros((3, 4, 8))}, lats, lons, np.arange(3))
        with pytest.raises(ValueError):
            pre.data_to_series(8, variables=["nope"])
        with pytest.raises(ValueError, match="shadows a source"):
            Preprocessor(
                {"x": np.zeros((3, 4, 8))}, lats, lons, np.arange(3),
                derived={"x": (("x",), lambda a: a)},
            )
        with pytest.raises(ValueError, match="unknown sources"):
            Preprocessor(
                {"x": np.zeros((3, 4, 8))}, lats, lons, np.arange(3),
                derived={"y": (("z",), lambda a: a)},
            )
        bad_shape = Preprocessor(
            {"x": np.zeros((3, 4, 8))}, lats, lons, np.arange(3),
            derived={"y": (("x",), lambda a: a[..., :4])},
        )
        with pytest.raises(ValueError, match="returned shape"):
            bad_shape.data_to_series(8, variables=["y"])


class TestSampleSlice:
    def test_per_host_sample_sharding(self):
        full = _dataset()
        half1 = _dataset(sample_slice=slice(0, full.n_samples // 2))
        half2 = _dataset(sample_slice=slice(full.n_samples // 2, None))
        assert half1.n_samples + half2.n_samples == full.n_samples
        assert set(half1._starts).isdisjoint(half2._starts)

    def test_empty_slice_rejected(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            _dataset(sample_slice=slice(0, 0))
