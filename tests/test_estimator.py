"""High-level estimator facade + scaling harness tests."""

import numpy as np
import pytest

import jax

from dlwp_cs_tpu.data import MemoryStore
from dlwp_cs_tpu.estimator import DLWPEstimator
from dlwp_cs_tpu.models import (
    CubeSphereUNet,
    DataConfig,
    ExperimentConfig,
    TrainConfig,
    UNetConfig,
)

N = 8


def _store(t=30, seed=0):
    rng = np.random.default_rng(seed)
    fields = rng.normal(size=(t, 6, N, N, 2)).astype(np.float32)
    consts = rng.normal(size=(6, N, N, 1)).astype(np.float32)
    return MemoryStore.from_raw(
        fields,
        np.arange(t) * 0.25,
        ("z500", "t2m"),
        constants=consts,
        constant_names=("topography",),
    )


def _config():
    return ExperimentConfig(
        data=DataConfig(
            grid_n=N, variables=("z500", "t2m"), constants=("topography",)
        ),
        model=UNetConfig(filters=(4, 8)),
        train=TrainConfig(batch_size=4, max_epochs=2, learning_rate=1e-3),
    )


class TestDLWPEstimator:
    def test_fit_forecast_save_load_roundtrip(self, tmp_path):
        est = DLWPEstimator(_config())
        est.fit(_store(), verbose=False)
        fc = est.forecast(_store(), init_indices=[5, 6], steps=3)
        assert fc.fields.shape == (2, 6, 6, N, N, 2)
        denorm = est.denormalize(fc.fields)
        assert denorm.shape == fc.fields.shape

        est.save(tmp_path / "model")
        back = DLWPEstimator.load(tmp_path / "model")
        fc2 = back.forecast(_store(), init_indices=[5, 6], steps=3)
        np.testing.assert_allclose(
            np.asarray(fc.fields), np.asarray(fc2.fields), atol=1e-5
        )

    def test_forecast_on_prenormalized_store_not_double_normalized(self):
        """Round 5: forecast()/forecast_lagged() applied (x-mean)/std to a
        pre-normalized training cache, double-normalizing the windows."""
        from dlwp_cs_tpu.data.store import normalize_store

        est = DLWPEstimator(_config())
        raw = _store()
        est.fit(raw, verbose=False)
        cache = normalize_store(raw)
        fc_raw = est.forecast(raw, init_indices=[5, 6], steps=2)
        fc_cache = est.forecast(cache, init_indices=[5, 6], steps=2)
        np.testing.assert_allclose(
            np.asarray(fc_raw.fields), np.asarray(fc_cache.fields),
            rtol=1e-4, atol=1e-5,
        )
        lg_raw = est.forecast_lagged(raw, init_indices=[8], steps=2,
                                     lags=(0, 1))
        lg_cache = est.forecast_lagged(cache, init_indices=[8], steps=2,
                                       lags=(0, 1))
        np.testing.assert_allclose(
            np.asarray(lg_raw.mean), np.asarray(lg_cache.mean),
            rtol=1e-4, atol=1e-5,
        )

    def test_forecast_rejects_mismatched_store_spacing(self):
        """Round 5: the interval x step_hours guard now also runs on the
        forecast path (a 3-hourly store fed to a 6-hourly model silently
        phase-shifted the forcing)."""
        est = DLWPEstimator(_config())
        est.fit(_store(), verbose=False)
        rng = np.random.default_rng(5)
        bad = MemoryStore.from_raw(
            rng.normal(size=(30, 6, N, N, 2)).astype(np.float32),
            np.arange(30) * 0.125,  # 3-hourly vs step_hours=6
            ("z500", "t2m"),
            constants=rng.normal(size=(6, N, N, 1)).astype(np.float32),
            constant_names=("topography",),
        )
        with pytest.raises(ValueError, match="step_hours"):
            est.forecast(bad, init_indices=[5], steps=1)

    def test_forecast_before_fit_rejected(self):
        est = DLWPEstimator(_config())
        with pytest.raises(RuntimeError):
            est.forecast(_store(), init_indices=[5], steps=1)
        with pytest.raises(RuntimeError):
            est.save("/tmp/nope")


class TestScalingHarness:
    def test_measure_scaling_runs(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from dlwp_cs_tpu.parallel.scaling import measure_scaling

        model = CubeSphereUNet(UNetConfig(output_channels=2, filters=(4,)))
        results = measure_scaling(
            model,
            n_grid=8,
            in_channels=3,
            out_channels=2,
            batch_per_device=2,
            mesh_configs=((1, 1), (2, 1), (2, 2)),
            iters=2,
        )
        assert len(results) == 3
        # the 1-device row IS the baseline: efficiency 1.0 (None only when
        # no single-device row was measured)
        assert results[0].efficiency_vs_single == 1.0
        assert all(r.efficiency_vs_single is not None for r in results)
        assert all(r.gridpoints_per_s > 0 for r in results)
        assert results[1].mesh_shape == (2, 1)
        assert results[2].n_devices == 4
