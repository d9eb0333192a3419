"""Serving subsystem: ForecastService batching + HTTP front end.

Covers the deployment path the reference never had (SURVEY.md §3.3 is a
host-driven notebook loop): raw-units request contract, micro-batch
coalescing, and the npz-over-HTTP round trip.
"""

import threading

import numpy as np
import pytest

from dlwp_cs_tpu.data import MemoryStore
from dlwp_cs_tpu.estimator import DLWPEstimator
from dlwp_cs_tpu.models import DataConfig, ExperimentConfig, TrainConfig, UNetConfig
from dlwp_cs_tpu.serve import (
    ForecastHTTPServer,
    ForecastService,
    forecast_request,
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


@pytest.fixture(scope="module")
def fitted():
    cfg = ExperimentConfig(
        data=DataConfig(
            grid_n=N, variables=("z500", "t2m"), constants=("topography",)
        ),
        model=UNetConfig(filters=(4, 8)),
        train=TrainConfig(batch_size=4, max_epochs=1, learning_rate=1e-3),
    )
    store = _store()
    est = DLWPEstimator(cfg)
    est.fit(store, verbose=False)
    return est, store


def _raw_window(store, init_index, t_in=2):
    return np.asarray(store.fields[init_index - (t_in - 1) : init_index + 1])


class TestForecastService:
    def test_matches_estimator_forecast(self, fitted):
        est, store = fitted
        svc = ForecastService(est, constants_store=store)
        idx = [5, 9]
        fc_ref = est.forecast(store, init_indices=idx, steps=3)
        want = est.denormalize(fc_ref.fields)

        windows = np.stack([_raw_window(store, i) for i in idx])
        t0 = np.asarray(store.times, np.float64)[idx]
        fc = svc.forecast(windows, t0, steps=3)
        assert fc.fields.shape == want.shape
        np.testing.assert_allclose(np.asarray(fc.fields), want, atol=1e-4)
        # normalized mode returns the raw rollout output
        fcn = svc.forecast(
            (windows - svc._mean) / svc._std, t0, steps=3, normalized=True
        )
        np.testing.assert_allclose(
            np.asarray(fcn.fields), np.asarray(fc_ref.fields), atol=1e-4
        )

    def test_single_member_window_accepted(self, fitted):
        est, store = fitted
        svc = ForecastService(est, constants_store=store)
        fc = svc.forecast(_raw_window(store, 5), store.times[5], steps=2)
        assert fc.fields.shape == (1, 4, 6, N, N, 2)

    def test_submit_coalesces(self, fitted):
        est, store = fitted
        svc = ForecastService(est, constants_store=store, max_batch=8,
                              max_wait_ms=300.0)
        idx = [3, 5, 7, 9]
        futs = [
            svc.submit(_raw_window(store, i), store.times[i], steps=2)
            for i in idx
        ]
        results = [f.result(timeout=120) for f in futs]
        # stats snapshot BEFORE the direct comparison calls below (direct
        # forecast() calls count requests/batches too — VERDICT r4 weak #5)
        assert svc.stats.requests == 4
        # 4 submissions within the 300 ms window must not take 4 dispatches
        assert svc.stats.batches < 4
        batches_before = svc.stats.batches
        # equivalence vs the direct path, member by member
        for i, fc in zip(idx, results):
            direct = svc.forecast(_raw_window(store, i), store.times[i], steps=2)
            np.testing.assert_allclose(
                np.asarray(fc.fields), np.asarray(direct.fields), atol=1e-4
            )
            assert fc.fields.shape[0] == 1
            np.testing.assert_allclose(
                np.asarray(fc.init_times), [store.times[i]]
            )
        # direct calls update the same counters, one batch per call
        assert svc.stats.requests == 8
        assert svc.stats.batches == batches_before + 4
        svc.close()

    def test_submit_mixed_steps(self, fitted):
        est, store = fitted
        svc = ForecastService(est, constants_store=store, max_wait_ms=100.0)
        f2 = svc.submit(_raw_window(store, 5), store.times[5], steps=2)
        f3 = svc.submit(_raw_window(store, 5), store.times[5], steps=3)
        assert f2.result(timeout=120).fields.shape[1] == 4
        assert f3.result(timeout=120).fields.shape[1] == 6
        svc.close()

    def test_close_flushes_pending_and_stashed(self, fitted):
        """A close() sentinel arriving mid-collection must not strand
        stashed mismatched-steps requests — both futures complete."""
        est, store = fitted
        svc = ForecastService(est, constants_store=store, max_wait_ms=500.0)
        f2 = svc.submit(_raw_window(store, 5), store.times[5], steps=2)
        f3 = svc.submit(_raw_window(store, 7), store.times[7], steps=3)
        svc.close()  # sentinel lands while the batcher is still collecting
        assert f2.result(timeout=120).fields.shape[1] == 4
        assert f3.result(timeout=120).fields.shape[1] == 6
        with pytest.raises(RuntimeError, match="closed"):
            svc.submit(_raw_window(store, 5), store.times[5], steps=2)

    def test_bad_window_shape(self, fitted):
        est, store = fitted
        svc = ForecastService(est, constants_store=store)
        with pytest.raises(ValueError, match="window"):
            svc.forecast(np.zeros((3, 6, N, N, 2), np.float32), 0.0, steps=1)

    def test_missing_constants_rejected(self, fitted):
        est, _ = fitted
        with pytest.raises(ValueError, match="constant"):
            ForecastService(est)

    def test_unfitted_estimator_rejected(self):
        cfg = ExperimentConfig(
            data=DataConfig(grid_n=N, variables=("z500", "t2m")),
            model=UNetConfig(filters=(4,)),
            train=TrainConfig(batch_size=2),
        )
        with pytest.raises(RuntimeError, match="state"):
            ForecastService(DLWPEstimator(cfg))

    def test_load_from_checkpoint(self, fitted, tmp_path):
        est, store = fitted
        est.save(tmp_path / "model")
        svc = ForecastService.load(tmp_path / "model", constants_store=store)
        fc = svc.forecast(_raw_window(store, 5), store.times[5], steps=1)
        direct = ForecastService(est, constants_store=store).forecast(
            _raw_window(store, 5), store.times[5], steps=1
        )
        np.testing.assert_allclose(
            np.asarray(fc.fields), np.asarray(direct.fields), atol=1e-5
        )


class TestMeshServing:
    def test_sharded_service_matches_single_device(self, fitted):
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        from dlwp_cs_tpu.parallel import create_mesh

        est, store = fitted
        mesh = create_mesh(data=2, spatial=2)
        svc = ForecastService(est, constants_store=store)
        svc_m = ForecastService(est, constants_store=store, mesh=mesh)
        w = np.stack([_raw_window(store, 5), _raw_window(store, 9),
                      _raw_window(store, 12)])
        t0 = np.asarray(store.times)[[5, 9, 12]]
        ref = svc.forecast(w, t0, steps=2)
        # batch 3 is NOT divisible by data=2: exercises the internal pad
        got = svc_m.forecast(w, t0, steps=2)
        assert got.fields.shape == ref.fields.shape
        np.testing.assert_allclose(
            np.asarray(got.fields), np.asarray(ref.fields), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(got.init_times), t0)

    def test_sharded_ensemble_pads_data_axis(self, fitted):
        # regression: forecast_ensemble under mesh= crashed for member
        # counts not divisible by the data axis (flattened B*M batch was
        # never padded)
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        from dlwp_cs_tpu.parallel import create_mesh

        est, store = fitted
        mesh = create_mesh(data=2, spatial=2)
        svc = ForecastService(est, constants_store=store)
        svc_m = ForecastService(est, constants_store=store, mesh=mesh)
        w = _raw_window(store, 5)
        t0 = float(store.times[5])
        # B=1, members=3 -> flattened batch 3, data axis 2
        ref = svc.forecast_ensemble(w, t0, steps=2, members=3, amplitude=0.0)
        got = svc_m.forecast_ensemble(w, t0, steps=2, members=3,
                                      amplitude=0.0)
        assert got.mean.shape == ref.mean.shape
        np.testing.assert_allclose(
            np.asarray(got.mean), np.asarray(ref.mean), atol=1e-4
        )
        assert np.asarray(got.init_times).shape == (1,)

    def test_cancelled_future_does_not_kill_batcher(self, fitted):
        # regression: a caller-cancelled Future made _flush raise
        # InvalidStateError, which terminated the worker thread and hung
        # every later submit
        est, store = fitted
        svc = ForecastService(est, constants_store=store, max_wait_ms=200.0)
        w = _raw_window(store, 5)
        t0 = float(store.times[5])
        fut = svc.submit(w, t0, steps=1)
        cancelled = fut.cancel()  # races the batcher; either way must be safe
        out = svc.submit(w, t0, steps=1).result(timeout=120)
        assert np.isfinite(np.asarray(out.fields)).all()
        if not cancelled:
            assert np.isfinite(np.asarray(fut.result(timeout=120).fields)).all()
        svc.close()

    def test_quantize_plus_mesh_rejected(self, fitted):
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        from dlwp_cs_tpu.parallel import create_mesh

        est, store = fitted
        with pytest.raises(ValueError, match="incompatible"):
            ForecastService(
                est, constants_store=store, quantize=True,
                mesh=create_mesh(data=2, spatial=2),
            )


from dlwp_cs_tpu.serve import MicroBatcher  # noqa: E402


class _BlockingService(MicroBatcher):
    """Batcher harness whose dispatch blocks on an event — lets the tests
    fill the bounded queue / expire deadlines deterministically."""

    def __init__(self, **kw):
        self._init_batcher(kw.pop("max_batch", 1), kw.pop("max_wait_ms", 1.0),
                           **kw)
        self.release = threading.Event()
        self.dispatched = []

    def _check_window(self, window):
        w = np.asarray(window, np.float32)
        return w if w.ndim == 2 else w[None]

    def _forecast_batch(self, window, t0, *, steps, normalized=False):
        from dlwp_cs_tpu.rollout.estimator import Forecast

        self.release.wait(timeout=60)
        self.dispatched.append(window.shape[0])
        return Forecast(
            fields=np.asarray(window), lead_hours=np.zeros(1),
            init_times=np.asarray(t0), variables=("x",),
        )


class TestBackpressure:
    def test_queue_full_sheds_load(self):
        from dlwp_cs_tpu.serve import ServiceOverloaded

        svc = _BlockingService(max_queue=2)
        w = np.zeros((1, 4), np.float32)
        futs = [svc.submit(w, 0.0, steps=1)]  # dequeued by the worker
        import time as _t

        _t.sleep(0.2)  # worker now blocked in dispatch; queue empty again
        futs += [svc.submit(w, 0.0, steps=1) for _ in range(2)]  # fills queue
        with pytest.raises(ServiceOverloaded, match="queue full"):
            svc.submit(w, 0.0, steps=1)
        svc.release.set()
        for f in futs:
            assert f.result(timeout=60) is not None
        svc.close()

    def test_close_with_full_queue_does_not_deadlock(self):
        # Regression (round 5): close() used to hold the stats lock while
        # doing a BLOCKING put(None) on the bounded queue; with the queue
        # full and the worker mid-dispatch (needing the same lock for its
        # stats update) the two deadlocked permanently.
        svc = _BlockingService(max_queue=2)
        w = np.zeros((1, 4), np.float32)
        futs = [svc.submit(w, 0.0, steps=1)]  # dequeued by the worker
        import time as _t

        _t.sleep(0.2)  # worker blocked in dispatch; queue empty again
        futs += [svc.submit(w, 0.0, steps=1) for _ in range(2)]  # fills queue

        done = threading.Event()

        def _close():
            svc.close()
            done.set()

        closer = threading.Thread(target=_close, daemon=True)
        closer.start()
        _t.sleep(0.3)
        svc.release.set()  # unblock the dispatch; close() must complete
        assert done.wait(timeout=30), "close() deadlocked against the worker"
        for f in futs:
            assert f.result(timeout=60) is not None
        svc.close()  # second close is a no-op

    def test_request_timeout_expires_queued(self):
        from dlwp_cs_tpu.serve import RequestTimeout

        svc = _BlockingService(max_queue=8, request_timeout_s=0.05)
        w = np.zeros((1, 4), np.float32)
        first = svc.submit(w, 0.0, steps=1)  # blocks the worker in dispatch
        import time as _t

        _t.sleep(0.3)
        stale = svc.submit(w, 0.0, steps=1)
        _t.sleep(0.2)  # stale's deadline passes while queued
        svc.release.set()
        assert first.result(timeout=60) is not None
        with pytest.raises(RequestTimeout, match="expired"):
            stale.result(timeout=60)
        svc.close()

    def test_ensemble_through_batcher_coalesces(self, fitted):
        est, store = fitted
        svc = ForecastService(est, constants_store=store, max_batch=8,
                              max_wait_ms=300.0)
        w = _raw_window(store, 5)
        t0 = float(store.times[5])
        # amplitude=0: the perturbation DRAWS depend on batch position, so a
        # coalesced dispatch legitimately differs from a b=1 dispatch under
        # noise; zero amplitude pins the batching/slicing wiring exactly
        futs = [
            svc.submit_ensemble(w, t0, steps=2, members=3, amplitude=0.0,
                                seed=7)
            for _ in range(3)
        ]
        results = [f.result(timeout=300) for f in futs]
        # one coalesced dispatch, not three serialized ones
        assert svc.stats.batches == 1
        assert svc.stats.requests == 3
        direct = svc.forecast_ensemble(
            w, t0, steps=2, members=3, amplitude=0.0,
            key=__import__("jax").random.PRNGKey(7),
        )
        for fc in results:
            assert fc.mean.shape == direct.mean.shape
            np.testing.assert_allclose(
                np.asarray(fc.mean), np.asarray(direct.mean), atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(fc.spread), np.asarray(direct.spread), atol=1e-4
            )
        svc.close()

    def test_ensemble_and_forecast_keys_do_not_mix(self, fitted):
        est, store = fitted
        svc = ForecastService(est, constants_store=store, max_wait_ms=100.0)
        w = _raw_window(store, 5)
        t0 = float(store.times[5])
        ffc = svc.submit(w, t0, steps=2)
        fens = svc.submit_ensemble(w, t0, steps=2, members=2)
        assert ffc.result(timeout=120).fields.shape[1] == 4
        assert fens.result(timeout=120).mean.shape[1] == 4
        svc.close()

    def test_server_side_caps(self, fitted):
        est, store = fitted
        svc = ForecastService(est, constants_store=store, max_steps=10,
                              max_members=4)
        w = _raw_window(store, 5)
        t0 = float(store.times[5])
        with pytest.raises(ValueError, match="server-side cap"):
            svc.forecast(w, t0, steps=11)
        with pytest.raises(ValueError, match="server-side cap"):
            svc.submit(w, t0, steps=11)
        with pytest.raises(ValueError, match="server-side cap"):
            svc.forecast_ensemble(w, t0, steps=2, members=5)
        with pytest.raises(ValueError, match="server-side cap"):
            svc.submit_ensemble(w, t0, steps=2, members=5)
        # at-cap values pass validation (and dispatch)
        fc = svc.forecast(w, t0, steps=10)
        assert np.isfinite(fc.fields).all()
        svc.close()

    def test_caps_rejected_over_http(self, fitted):
        from dlwp_cs_tpu.serve import ensemble_request

        est, store = fitted
        svc = ForecastService(est, constants_store=store, max_members=4)
        srv = ForecastHTTPServer(svc, port=0).start()
        try:
            w = _raw_window(store, 5)
            with pytest.raises(RuntimeError, match="400"):
                ensemble_request(
                    "127.0.0.1", srv.port, w, float(store.times[5]), 2, 99
                )
        finally:
            srv.stop()


class TestHTTP:
    @pytest.fixture()
    def server(self, fitted):
        est, store = fitted
        svc = ForecastService(est, constants_store=store, max_wait_ms=50.0)
        srv = ForecastHTTPServer(svc, port=0).start()
        yield srv, store
        srv.stop()

    def test_health_and_info(self, server):
        import http.client
        import json

        srv, _ = server
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read()) == {"status": "ok"}
        conn.request("GET", "/info")
        info = json.loads(conn.getresponse().read())
        assert info["grid_n"] == N
        assert info["variables"] == ["z500", "t2m"]
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
        conn.close()

    def test_forecast_round_trip(self, server):
        srv, store = server
        window = _raw_window(store, 6)
        fields, lead, init = forecast_request(
            "127.0.0.1", srv.port, window, float(store.times[6]), 2
        )
        direct = srv.service.forecast(window, store.times[6], steps=2)
        np.testing.assert_allclose(fields, np.asarray(direct.fields), atol=1e-5)
        np.testing.assert_allclose(lead, np.asarray(direct.lead_hours))
        assert init.shape == (1,)

    def test_concurrent_requests_coalesce(self, server):
        srv, store = server
        results = {}

        def call(i):
            results[i] = forecast_request(
                "127.0.0.1", srv.port, _raw_window(store, i),
                float(store.times[i]), 2,
            )

        threads = [threading.Thread(target=call, args=(i,)) for i in (4, 6, 8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert set(results) == {4, 6, 8}
        for i, (fields, _, _) in results.items():
            direct = srv.service.forecast(
                _raw_window(store, i), store.times[i], steps=2
            )
            np.testing.assert_allclose(
                fields, np.asarray(direct.fields), atol=1e-4
            )

    def test_malformed_post_rejected(self, server):
        import http.client

        srv, _ = server
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("POST", "/forecast", body=b"not-an-npz",
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.close()
