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
        assert (path / f"rollout_s{STEPS}_b1.bin").exists()
        assert (path / f"rollout_s{STEPS}_b4.bin").exists()
        assert (path / "stats.npz").exists()
        meta = json.loads((path / "meta.json").read_text())
        assert meta["steps"] == STEPS
        assert meta["steps_values"] == [STEPS]
        assert meta["batch_sizes"] == [1, 4]
        assert meta["window_shape"] == [2, 6, N, N, 2]
        assert meta["variables"] == ["z500", "t2m"]
        exp = ExportedForecaster.load(path)
        assert len(exp._lead_hours(STEPS)) == STEPS * 2

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

    def test_format1_backcompat(self, artifact, tmp_path):
        """A round-4 (format 1) artifact layout still loads and serves."""
        import shutil

        _, store, path = artifact
        old = tmp_path / "format1"
        shutil.copytree(path, old)
        meta = json.loads((old / "meta.json").read_text())
        meta["format"] = 1
        meta["steps"] = STEPS
        meta.pop("steps_values")
        meta["lead_hours"] = [(i + 1) * 6.0 for i in range(STEPS * 2)]
        (old / "meta.json").write_text(json.dumps(meta))
        for b in (1, 4):
            (old / f"rollout_s{STEPS}_b{b}.bin").rename(
                old / f"rollout_b{b}.bin"
            )
        exp = ExportedForecaster.load(old)
        window = np.asarray(store.fields[4:6])
        fc = exp.forecast(window, float(store.times[5]))  # steps implied
        assert fc.fields.shape == (1, STEPS * 2, 6, N, N, 2)
        assert len(fc.lead_hours) == STEPS * 2

    def test_reexport_removes_stale_executables(self, artifact, tmp_path):
        """export_forecaster into an existing dir clears old rollout_*.bin
        (ADVICE r4: leftovers from an older steps/config lingered)."""
        import shutil

        est, store, path = artifact
        target = tmp_path / "re"
        shutil.copytree(path, target)
        stale = target / "rollout_s99_b7.bin"
        stale.write_bytes(b"stale")
        export_forecaster(
            est, target, steps=STEPS, batch_sizes=(1,), constants_store=store
        )
        assert not stale.exists()
        assert not (target / f"rollout_s{STEPS}_b4.bin").exists()  # old bucket
        assert (target / f"rollout_s{STEPS}_b1.bin").exists()
        # and it still serves
        exp = ExportedForecaster.load(target)
        fc = exp.forecast(
            np.asarray(store.fields[4:6]), float(store.times[5])
        )
        assert np.isfinite(fc.fields).all()


    def test_failed_reexport_preserves_old_artifact(self, artifact,
                                                    tmp_path, monkeypatch):
        """A mid-export failure over a live artifact dir must leave the
        previous artifact loadable (round 5: executables are staged under
        tmp names; stale deletion + meta rewrite happen only after every
        export succeeds)."""
        import shutil

        from dlwp_cs_tpu.serve import export as export_mod

        est, store, path = artifact
        target = tmp_path / "live"
        shutil.copytree(path, target)
        before = sorted(p.name for p in target.glob("rollout_*.bin"))

        real_export = export_mod.jax_export.export
        calls = {"n": 0}

        def failing_export(*a, **kw):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("simulated mid-export failure")
            return real_export(*a, **kw)

        monkeypatch.setattr(export_mod.jax_export, "export", failing_export)
        with pytest.raises(RuntimeError, match="simulated"):
            export_forecaster(
                est, target, steps=STEPS, batch_sizes=(1, 2),
                constants_store=store,
            )
        # old executables + meta intact, no tmp litter, still serves
        assert sorted(p.name for p in target.glob("rollout_*.bin")) == before
        assert not list(target.glob(".rollout_*.tmp"))
        exp = ExportedForecaster.load(target)
        fc = exp.forecast(
            np.asarray(store.fields[4:6]), float(store.times[5])
        )
        assert np.isfinite(fc.fields).all()

    def test_empty_steps_rejected(self, artifact, tmp_path):
        est, store, _ = artifact
        with pytest.raises(ValueError, match="at least one"):
            export_forecaster(est, tmp_path / "x", steps=[],
                              constants_store=store)
        with pytest.raises(ValueError, match="at least one"):
            export_forecaster(est, tmp_path / "x", steps=STEPS,
                              batch_sizes=(), constants_store=store)


class TestMultiStepsArtifact:
    @pytest.fixture(scope="class")
    def multi(self, artifact, tmp_path_factory):
        est, store, _ = artifact
        path = tmp_path_factory.mktemp("export_multi") / "artifact"
        export_forecaster(
            est, path, steps=(1, STEPS), batch_sizes=(1,),
            constants_store=store,
        )
        return est, store, path

    def test_two_steps_values_served(self, multi):
        est, store, path = multi
        exp = ExportedForecaster.load(path)
        assert exp.steps_values == [1, STEPS]
        window = np.asarray(store.fields[4:6])
        t0 = float(store.times[5])
        svc = ForecastService(est, constants_store=store)
        for s in (1, STEPS):
            aot = exp.forecast(window, t0, steps=s)
            live = svc.forecast(window, t0, steps=s)
            assert aot.fields.shape == live.fields.shape
            np.testing.assert_allclose(
                np.asarray(aot.fields), np.asarray(live.fields),
                rtol=1e-5, atol=1e-5,
            )
        # ambiguous / unexported steps -> clean errors
        with pytest.raises(ValueError, match="pass steps"):
            exp.forecast(window, t0)
        with pytest.raises(ValueError, match="exported with steps"):
            exp.forecast(window, t0, steps=2)

    def test_multi_steps_over_http(self, multi):
        """One artifact serves two different steps values over HTTP
        (VERDICT r4 next #6's done-criterion)."""
        from dlwp_cs_tpu.serve import (
            ExportedForecastService,
            ForecastHTTPServer,
            forecast_request,
        )

        _, store, path = multi
        svc = ExportedForecastService(path, max_wait_ms=50.0)
        assert svc.steps_values == [1, STEPS]
        srv = ForecastHTTPServer(svc).start()
        try:
            window = np.asarray(store.fields[4:6])
            t0 = float(store.times[5])
            f1, lead1, _ = forecast_request(
                "127.0.0.1", srv.port, window, t0, 1
            )
            f3, lead3, _ = forecast_request(
                "127.0.0.1", srv.port, window, t0, STEPS
            )
            assert f1.shape[1] == 2 and f3.shape[1] == STEPS * 2
            assert len(lead1) == 2 and len(lead3) == STEPS * 2
            # the common prefix of the two products is the same model call
            np.testing.assert_allclose(f3[:, :2], f1, rtol=1e-5, atol=1e-5)
            with pytest.raises(RuntimeError, match="exported with steps"):
                forecast_request("127.0.0.1", srv.port, window, t0, 2)
        finally:
            srv.stop()
