"""TensorStore zarr-format training cache tests."""

import numpy as np
import pytest

pytest.importorskip("tensorstore")

from dlwp_cs_tpu.data import MemoryStore, SeriesDataset
from dlwp_cs_tpu.data.tscache import open_ts_cache, write_ts_cache
from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.models import DataConfig

N, T = 6, 20


def _store():
    rng = np.random.default_rng(0)
    return MemoryStore.from_raw(
        rng.normal(size=(T, 6, N, N, 2)).astype(np.float32),
        np.arange(T) * 0.25,
        ("z500", "t2m"),
        constants=rng.normal(size=(6, N, N, 1)).astype(np.float32),
        constant_names=("topo",),
        attrs={"grid_n": N},
    )


def test_roundtrip(tmp_path):
    store = _store()
    write_ts_cache(tmp_path / "cache", store)
    back = open_ts_cache(tmp_path / "cache")
    assert back.grid_n == N
    assert back.variables == store.variables
    np.testing.assert_allclose(back.fields[3], store.fields[3])
    np.testing.assert_allclose(back.fields[[5, 2]], store.fields[[5, 2]])
    np.testing.assert_allclose(back.constants, store.constants)
    m = back.load()
    np.testing.assert_allclose(m.fields, store.fields)


def test_series_dataset_over_ts_cache(tmp_path):
    store = _store()
    write_ts_cache(tmp_path / "cache", store)
    back = open_ts_cache(tmp_path / "cache")
    cs = CubedSphere(N)
    lat, lon = cs.cell_latlon
    cfg = DataConfig(grid_n=N, variables=store.variables, constants=("topo",))
    ds_mem = SeriesDataset(store, cfg, lat=lat, lon=lon, batch_size=4)
    ds_ts = SeriesDataset(back, cfg, lat=lat, lon=lon, batch_size=4)
    x1, y1 = next(iter(ds_mem))
    x2, y2 = next(iter(ds_ts))
    np.testing.assert_allclose(x1, x2, rtol=1e-6)
    np.testing.assert_allclose(y1, y2, rtol=1e-6)
