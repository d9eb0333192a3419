"""AOT-exported serving artifacts (serve/export.py).

Pins the StableHLO round trip: export a fitted estimator's rollout, load it
back through ``ExportedForecaster`` (which needs no model code), and match
the live ``ForecastService`` output bitwise-close — plus the artifact's
bucket/padding and contract checks.
"""

import json

import numpy as np
import pytest

from dlwp_cs_tpu.data import MemoryStore
from dlwp_cs_tpu.estimator import DLWPEstimator
from dlwp_cs_tpu.models import DataConfig, ExperimentConfig, TrainConfig, UNetConfig
from dlwp_cs_tpu.serve import ExportedForecaster, ForecastService, export_forecaster

N = 8
STEPS = 3


def _store(t=24, seed=0):
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


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = ExperimentConfig(
        data=DataConfig(
            grid_n=N, variables=("z500", "t2m"), constants=("topography",)
        ),
        model=UNetConfig(filters=(4, 8)),
        train=TrainConfig(batch_size=4, max_epochs=1),
    )
    store = _store()
    est = DLWPEstimator(cfg)
    est.fit(store, verbose=False)
    path = tmp_path_factory.mktemp("export") / "artifact"
    export_forecaster(
        est, path, steps=STEPS, batch_sizes=(1, 4), constants_store=store
    )
    return est, store, path


class TestExportArtifact:
    def test_layout_and_meta(self, artifact):
        _, _, path = artifact
        assert (path / "rollout_b1.bin").exists()
        assert (path / "rollout_b4.bin").exists()
        assert (path / "stats.npz").exists()
        meta = json.loads((path / "meta.json").read_text())
        assert meta["steps"] == STEPS
        assert meta["batch_sizes"] == [1, 4]
        assert meta["window_shape"] == [2, 6, N, N, 2]
        assert meta["variables"] == ["z500", "t2m"]
        assert len(meta["lead_hours"]) == STEPS * 2

    def test_matches_live_service(self, artifact):
        est, store, path = artifact
        svc = ForecastService(est, constants_store=store)
        exp = ExportedForecaster.load(path)
        window = np.asarray(store.fields[4:6])  # single member (T_in, ...)
        t0 = float(store.times[5])
        live = svc.forecast(window, t0, steps=STEPS)
        aot = exp.forecast(window, t0)
        assert aot.fields.shape == live.fields.shape
        np.testing.assert_allclose(
            np.asarray(aot.fields), np.asarray(live.fields),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(aot.lead_hours), np.asarray(live.lead_hours)
        )
        assert aot.variables == ("z500", "t2m")

    def test_bucketing_and_padding(self, artifact):
        est, store, path = artifact
        exp = ExportedForecaster.load(path)
        # batch 3 buckets to the exported 4; results equal per-member calls
        windows = np.stack(
            [np.asarray(store.fields[i - 1 : i + 1]) for i in (5, 8, 11)]
        )
        t0 = np.asarray(store.times, np.float64)[[5, 8, 11]]
        batched = exp.forecast(windows, t0)
        assert batched.fields.shape[0] == 3
        for i in range(3):
            single = exp.forecast(windows[i], float(t0[i]))
            np.testing.assert_allclose(
                batched.fields[i], single.fields[0], rtol=1e-5, atol=1e-4
            )
        # beyond the largest exported bucket -> clean error
        big = np.repeat(windows, 2, axis=0)
        with pytest.raises(ValueError, match="exceeds the largest"):
            exp.forecast(big, np.repeat(t0, 2))

    def test_normalized_mode_and_contract_errors(self, artifact):
        est, store, path = artifact
        exp = ExportedForecaster.load(path)
        window = np.asarray(store.fields[4:6])
        t0 = float(store.times[5])
        raw = exp.forecast(window, t0)
        norm = exp.forecast(
            (window - exp._mean) / exp._std, t0, normalized=True
        )
        np.testing.assert_allclose(
            np.asarray(norm.fields) * exp._std + exp._mean,
            np.asarray(raw.fields),
            rtol=1e-5, atol=1e-5,
        )
        with pytest.raises(ValueError, match="window must be"):
            exp.forecast(window[..., :1], t0)
        with pytest.raises(ValueError, match="t0_days batch"):
            exp.forecast(np.stack([window] * 4), np.asarray([t0, t0]))

    def test_artifact_served_over_http(self, artifact):
        # the full deployment story: HTTP front end over the AOT artifact
        # alone, no estimator/model objects
        from dlwp_cs_tpu.serve import (
            ExportedForecastService,
            ForecastHTTPServer,
            ForecastService,
            forecast_request,
        )

        est, store, path = artifact
        svc = ExportedForecastService(path, max_wait_ms=100.0)
        assert svc.steps == STEPS
        assert svc.info()["backend"] == "aot-artifact"
        srv = ForecastHTTPServer(svc).start()
        try:
            window = np.asarray(store.fields[4:6])
            t0 = float(store.times[5])
            fields, lead, init = forecast_request(
                "127.0.0.1", srv.port, window, t0, STEPS
            )
            live = ForecastService(est, constants_store=store).forecast(
                window, t0, steps=STEPS
            )
            np.testing.assert_allclose(
                fields, np.asarray(live.fields), rtol=1e-5, atol=1e-5
            )
            # wrong steps -> clean 400 with the artifact message
            with pytest.raises(RuntimeError, match="exported with steps"):
                forecast_request("127.0.0.1", srv.port, window, t0,
                                 STEPS + 1)
            # /ensemble unsupported on artifact backends: a WELL-FORMED
            # ensemble request must hit the hasattr gate, not the
            # malformed-payload 400
            from dlwp_cs_tpu.serve import ensemble_request

            with pytest.raises(RuntimeError,
                               match="does not support /ensemble"):
                ensemble_request("127.0.0.1", srv.port, window, t0,
                                 STEPS, 3)
            # meta carries the temporal contract for window construction
            assert svc.info()["step_hours"] == 6.0
            assert svc.info()["output_time_steps"] == 2
        finally:
            srv.stop()
        assert svc.stats.requests >= 1

    def test_unfitted_estimator_rejected(self, tmp_path):
        cfg = ExperimentConfig(
            data=DataConfig(grid_n=N, variables=("z500", "t2m"), constants=()),
            model=UNetConfig(filters=(4, 8)),
            train=TrainConfig(batch_size=4, max_epochs=1),
        )
        est = DLWPEstimator(cfg)
        with pytest.raises(RuntimeError, match="fit or load"):
            export_forecaster(est, tmp_path / "x", steps=1)

    def test_format_version_guard(self, artifact, tmp_path):
        _, _, path = artifact
        import shutil

        broken = tmp_path / "broken"
        shutil.copytree(path, broken)
        meta = json.loads((broken / "meta.json").read_text())
        meta["format"] = 999
        (broken / "meta.json").write_text(json.dumps(meta))
        with pytest.raises(ValueError, match="unsupported artifact format"):
            ExportedForecaster.load(broken)
