"""Ensemble rollout + probabilistic verification.

The reference has no ensemble machinery (its ensemble papers looped
``TimeSeriesEstimator.predict`` per member on the host); this pins the
TPU-native batched-member rollout (rollout/ensemble.py) and the CRPS /
spread-error / rank-histogram scores (verify/ensemble.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.data import MemoryStore
from dlwp_cs_tpu.estimator import DLWPEstimator
from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.models import (
    CubeSphereUNet,
    DataConfig,
    ExperimentConfig,
    TrainConfig,
    UNetConfig,
)
from dlwp_cs_tpu.rollout import (
    EnsembleForecaster,
    TimeSeriesEstimator,
    ic_perturbations,
)
from dlwp_cs_tpu.serve import ForecastService
from dlwp_cs_tpu.verify import crps_ensemble, rank_histogram, spread_error

N = 8


@pytest.fixture(scope="module")
def small_model():
    dcfg = DataConfig(grid_n=N, variables=("z500", "t2m"), constants=())
    mcfg = UNetConfig(
        output_channels=dcfg.output_channels, filters=(4, 8)
    )
    model = CubeSphereUNet(mcfg)
    cs = CubedSphere(N)
    lat, lon = cs.cell_latlon
    rng = np.random.default_rng(0)
    window = jnp.asarray(
        rng.normal(size=(2, dcfg.input_time_steps, 6, N, N, 2)), jnp.float32
    )
    from dlwp_cs_tpu.data.channels import pack_inputs

    x0 = pack_inputs(
        window, jnp.zeros(window.shape[:1] + (dcfg.input_time_steps, 6, N, N)),
        None,
    )
    params = model.init(jax.random.PRNGKey(0), x0)
    return model, params, dcfg, lat, lon, window


class TestICPerturbations:
    def test_member0_is_control_and_antithetic_pairs(self):
        key = jax.random.PRNGKey(1)
        pert = ic_perturbations(key, (3, 2, 6, N, N, 2), members=5)
        assert pert.shape == (3, 5, 2, 6, N, N, 2)
        assert float(jnp.max(jnp.abs(pert[:, 0]))) == 0.0
        # members 1..4 are two exact +/- pairs -> ensemble mean is zero
        # (to f32 reduction rounding)
        np.testing.assert_allclose(
            np.asarray(jnp.mean(pert, axis=1)), 0.0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pert[:, 1]), -np.asarray(pert[:, 3])
        )

    def test_odd_pert_count_unpaired_tail(self):
        pert = ic_perturbations(jax.random.PRNGKey(2), (1, 4), members=4)
        # 3 perturbations: one +/- pair plus one unpaired
        np.testing.assert_allclose(
            np.asarray(pert[:, 1]), -np.asarray(pert[:, 3])
        )
        assert float(jnp.max(jnp.abs(pert[:, 2]))) > 0

    def test_members_one(self):
        pert = ic_perturbations(jax.random.PRNGKey(0), (2, 3), members=1)
        assert pert.shape == (2, 1, 3)
        assert float(jnp.max(jnp.abs(pert))) == 0.0


class TestEnsembleForecaster:
    def test_zero_amplitude_matches_deterministic(self, small_model):
        model, params, dcfg, lat, lon, window = small_model
        det = TimeSeriesEstimator(
            apply_fn=model.apply, params=params, data_cfg=dcfg,
            lat=lat, lon=lon,
        ).predict(window, 9132.5, steps=3)
        ens = EnsembleForecaster(
            apply_fn=model.apply, params=params, data_cfg=dcfg,
            lat=lat, lon=lon,
        ).predict(window, 9132.5, steps=3, members=4, amplitude=0.0,
                  keep_members=True)
        # batched-(B*M) vs batched-B dispatch differ only by XLA batching
        # numerics (untrained rollouts amplify to O(100), hence rtol)
        np.testing.assert_allclose(
            np.asarray(ens.mean), np.asarray(det.fields), rtol=1e-5,
            atol=1e-3,
        )
        # members of one dispatch are bitwise identical at amplitude 0
        np.testing.assert_allclose(np.asarray(ens.spread), 0.0, atol=1e-6)
        for m in range(1, 4):
            np.testing.assert_array_equal(
                np.asarray(ens.members[:, m]), np.asarray(ens.members[:, 0])
            )

    def test_member0_is_control_and_stats_consistent(self, small_model):
        model, params, dcfg, lat, lon, window = small_model
        det = TimeSeriesEstimator(
            apply_fn=model.apply, params=params, data_cfg=dcfg,
            lat=lat, lon=lon,
        ).predict(window, 9132.5, steps=2)
        ens = EnsembleForecaster(
            apply_fn=model.apply, params=params, data_cfg=dcfg,
            lat=lat, lon=lon,
        ).predict(window, 9132.5, steps=2, members=5, amplitude=0.02,
                  key=jax.random.PRNGKey(7), keep_members=True)
        # member 0 ran the unperturbed control window
        np.testing.assert_allclose(
            np.asarray(ens.members[:, 0]), np.asarray(det.fields),
            rtol=1e-5, atol=1e-3,
        )
        # mean/spread match the member stack
        np.testing.assert_allclose(
            np.asarray(ens.mean), np.asarray(ens.members).mean(axis=1),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ens.spread),
            np.asarray(ens.members).std(axis=1, ddof=1),
            atol=1e-5,
        )
        assert float(np.max(np.asarray(ens.spread))) > 0
        # per-batch-member init times accepted too
        t0 = np.asarray([9132.5, 9140.25])
        ens2 = EnsembleForecaster(
            apply_fn=model.apply, params=params, data_cfg=dcfg,
            lat=lat, lon=lon,
        ).predict(window, t0, steps=2, members=3, amplitude=0.02)
        assert ens2.mean.shape == ens.mean.shape
        assert ens2.variables == tuple(dcfg.variables)

    def test_per_channel_amplitude(self, small_model):
        model, params, dcfg, lat, lon, window = small_model
        fc = EnsembleForecaster(
            apply_fn=model.apply, params=params, data_cfg=dcfg,
            lat=lat, lon=lon,
        )
        # channel-1 amplitude zero: only channel-0 IC noise enters; spread
        # still nonzero everywhere downstream (the model mixes channels),
        # but the call must accept a per-channel vector without recompiling
        # per value (traced arg).
        out = fc.predict(window, 9132.5, steps=1, members=4,
                         amplitude=jnp.asarray([0.05, 0.0]))
        assert out.spread.shape == out.mean.shape


class TestServiceEnsemble:
    def test_denormalized_ensemble(self):
        rng = np.random.default_rng(3)
        t = 20
        fields = rng.normal(size=(t, 6, N, N, 2)).astype(np.float32)
        store = MemoryStore.from_raw(
            fields, np.arange(t) * 0.25, ("z500", "t2m")
        )
        cfg = ExperimentConfig(
            data=DataConfig(grid_n=N, variables=("z500", "t2m"), constants=()),
            model=UNetConfig(filters=(4, 8)),
            train=TrainConfig(batch_size=4, max_epochs=1),
        )
        est = DLWPEstimator(cfg)
        est.fit(store, verbose=False)
        svc = ForecastService(est)
        window = np.asarray(store.fields[4:6])
        t0 = float(store.times[5])
        fc = svc.forecast(window, t0, steps=2)
        ens = svc.forecast_ensemble(
            window, t0, steps=2, members=4, amplitude=0.0
        )
        np.testing.assert_allclose(
            np.asarray(ens.mean), np.asarray(fc.fields), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(ens.spread), 0.0, atol=1e-4)
        ens2 = svc.forecast_ensemble(
            window, t0, steps=2, members=4, amplitude=0.05,
            key=jax.random.PRNGKey(1), keep_members=True,
        )
        assert ens2.members.shape == (1, 4) + fc.fields.shape[1:]
        assert float(np.max(ens2.spread)) > 0
        assert svc.stats.requests >= 2

    def test_http_ensemble_roundtrip(self):
        from dlwp_cs_tpu.serve import ForecastHTTPServer, ensemble_request

        rng = np.random.default_rng(6)
        t = 20
        fields = rng.normal(size=(t, 6, N, N, 2)).astype(np.float32)
        store = MemoryStore.from_raw(
            fields, np.arange(t) * 0.25, ("z500", "t2m")
        )
        cfg = ExperimentConfig(
            data=DataConfig(grid_n=N, variables=("z500", "t2m"), constants=()),
            model=UNetConfig(filters=(4, 8)),
            train=TrainConfig(batch_size=4, max_epochs=1),
        )
        est = DLWPEstimator(cfg)
        est.fit(store, verbose=False)
        svc = ForecastService(est)
        srv = ForecastHTTPServer(svc).start()
        try:
            window = np.asarray(store.fields[4:6])
            t0 = float(store.times[5])
            direct = svc.forecast_ensemble(
                window, t0, steps=2, members=3, amplitude=0.05,
                key=jax.random.PRNGKey(2), keep_members=True,
            )
            got = ensemble_request(
                "127.0.0.1", srv.port, window, t0, 2, 3,
                amplitude=0.05, seed=2, keep_members=True,
            )
            np.testing.assert_allclose(
                got["mean"], np.asarray(direct.mean), rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                got["spread"], np.asarray(direct.spread), rtol=1e-5,
                atol=1e-5,
            )
            assert got["members"].shape == direct.members.shape
            # malformed request -> clean 400
            import http.client

            conn = http.client.HTTPConnection("127.0.0.1", srv.port)
            conn.request("POST", "/ensemble", body=b"junk",
                         headers={"Content-Length": "4"})
            assert conn.getresponse().status == 400
            conn.close()
        finally:
            srv.stop()


class TestLaggedEnsemble:
    @pytest.fixture(scope="class")
    def fitted_store(self):
        rng = np.random.default_rng(9)
        t = 30
        fields = rng.normal(size=(t, 6, N, N, 2)).astype(np.float32)
        store = MemoryStore.from_raw(
            fields, np.arange(t) * 0.25, ("z500", "t2m")
        )
        cfg = ExperimentConfig(
            data=DataConfig(grid_n=N, variables=("z500", "t2m"), constants=()),
            model=UNetConfig(filters=(4, 8)),
            train=TrainConfig(batch_size=4, max_epochs=1),
        )
        est = DLWPEstimator(cfg)
        est.fit(store, verbose=False)
        return est, store

    def test_members_align_to_per_lag_forecasts(self, fitted_store):
        est, store = fitted_store
        lags = (0, 1, 2)
        steps = 3
        i0 = 20
        ens = est.forecast_lagged(
            store, init_indices=[i0], steps=steps, lags=lags,
            keep_members=True,
        )
        t_out = est.config.data.output_time_steps
        n_lead = steps * t_out
        assert ens.members.shape[:3] == (1, len(lags), n_lead)
        for m, g in enumerate(lags):
            # member m == a deterministic forecast initialized g steps
            # earlier, rolled long enough, leads [g : g + n_lead)
            extra = -(-g // t_out)
            det = est.forecast(
                store, init_indices=[i0 - g], steps=steps + extra
            )
            np.testing.assert_allclose(
                np.asarray(ens.members[:, m]),
                np.asarray(det.fields)[:, g : g + n_lead],
                rtol=1e-5, atol=1e-4,
            )
        np.testing.assert_allclose(
            np.asarray(ens.mean), np.asarray(ens.members).mean(axis=1),
            atol=1e-5,
        )
        assert float(np.max(np.asarray(ens.spread))) > 0
        # control-only lags degenerate to the deterministic forecast
        solo = est.forecast_lagged(
            store, init_indices=[i0], steps=steps, lags=(0,)
        )
        det0 = est.forecast(store, init_indices=[i0], steps=steps)
        np.testing.assert_allclose(
            np.asarray(solo.mean), np.asarray(det0.fields), rtol=1e-5,
            atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(solo.spread), 0.0)

    def test_contract_errors(self, fitted_store):
        est, store = fitted_store
        with pytest.raises(ValueError, match="lags must start at 0"):
            est.forecast_lagged(store, init_indices=[20], steps=2,
                                lags=(1, 2))
        with pytest.raises(ValueError, match="preceding store samples"):
            est.forecast_lagged(store, init_indices=[2], steps=2,
                                lags=(0, 5))

    def test_lagged_cache_not_stale_after_stats_change(self, fitted_store):
        # regression: the jitted-lagged-rollout cache bakes in insolation
        # stats; a changed normalization (e.g. after a re-fit) must MISS
        # the cache rather than silently reuse the old closure
        est, store = fitted_store
        old = est.forecast_lagged(store, init_indices=[20], steps=1,
                                  lags=(0, 1))
        saved = dict(est.stats)
        try:
            est.stats = {**est.stats,
                         "insol_mean": float(est.stats["insol_mean"]) + 5.0}
            new = est.forecast_lagged(store, init_indices=[20], steps=1,
                                      lags=(0, 1))
        finally:
            est.stats = saved
        assert not np.allclose(np.asarray(old.mean), np.asarray(new.mean))

    def test_batched_inits(self, fitted_store):
        est, store = fitted_store
        ens = est.forecast_lagged(
            store, init_indices=[15, 20], steps=2, lags=(0, 2)
        )
        assert ens.mean.shape[0] == 2
        assert np.isfinite(np.asarray(ens.mean)).all()
        assert tuple(np.asarray(ens.init_times).shape) == (2,)


class TestMultiModelEnsemble:
    def test_members_match_individual_models(self, small_model):
        from dlwp_cs_tpu.rollout import make_multimodel_rollout, stack_params

        model, params0, dcfg, lat, lon, window = small_model
        # a second "seed": params re-initialized with a different key
        from dlwp_cs_tpu.data.channels import pack_inputs

        x0 = pack_inputs(
            window,
            jnp.zeros(window.shape[:1] + (dcfg.input_time_steps, 6, N, N)),
            None,
        )
        params1 = model.init(jax.random.PRNGKey(42), x0)
        stack = stack_params([params0, params1])
        multi = jax.jit(make_multimodel_rollout(
            model.apply, dcfg, lat=lat, lon=lon, steps=2, keep_members=True,
        ))
        ens = multi(stack, window, 9132.5)
        assert ens.members.shape[:2] == (window.shape[0], 2)
        for i, p in enumerate([params0, params1]):
            det = TimeSeriesEstimator(
                apply_fn=model.apply, params=p, data_cfg=dcfg,
                lat=lat, lon=lon,
            ).predict(window, 9132.5, steps=2)
            np.testing.assert_allclose(
                np.asarray(ens.members[:, i]), np.asarray(det.fields),
                rtol=1e-5, atol=1e-3,
            )
        np.testing.assert_allclose(
            np.asarray(ens.mean), np.asarray(ens.members).mean(axis=1),
            atol=1e-5,
        )
        assert float(np.max(np.asarray(ens.spread))) > 0

    def test_stack_params_contract(self, small_model):
        from dlwp_cs_tpu.rollout import stack_params

        _, params0, *_ = small_model
        with pytest.raises(ValueError, match="at least one"):
            stack_params([])
        import flax

        bad = flax.core.unfreeze(params0) if hasattr(flax.core, "unfreeze") else dict(params0)
        bad = jax.tree.map(lambda x: x, bad)
        # remove a leaf -> different structure
        key0 = next(iter(bad["params"]))
        del bad["params"][key0]
        with pytest.raises(ValueError, match="differ in structure"):
            stack_params([params0, bad])


class TestCRPS:
    def test_deterministic_ensemble_equals_mae(self):
        x = np.asarray([[1.5, 1.5, 1.5]])  # (1 point, M=3) identical
        y = np.asarray([2.0])
        got = np.asarray(crps_ensemble(jnp.asarray(x), jnp.asarray(y),
                                       member_axis=-1))
        np.testing.assert_allclose(got, 0.5, atol=1e-6)

    def test_matches_pairwise_bruteforce(self):
        rng = np.random.default_rng(0)
        mem = rng.normal(size=(4, 7, 5)).astype(np.float32)  # (B, M, L)
        tru = rng.normal(size=(4, 5)).astype(np.float32)
        got = np.asarray(crps_ensemble(jnp.asarray(mem), jnp.asarray(tru)))
        m = mem.shape[1]
        mae = np.mean(np.abs(mem - tru[:, None]), axis=1)
        pair = np.abs(mem[:, :, None] - mem[:, None, :]).sum(axis=(1, 2))
        want_fair = mae - pair / (2 * m * (m - 1))
        np.testing.assert_allclose(got, want_fair, atol=1e-5)
        got_std = np.asarray(
            crps_ensemble(jnp.asarray(mem), jnp.asarray(tru), fair=False)
        )
        want_std = mae - pair / (2 * m * m)
        np.testing.assert_allclose(got_std, want_std, atol=1e-5)

    def test_perfect_sample_beats_offset(self):
        # CRPS should prefer an ensemble sampled from the truth's
        # distribution over a biased one
        rng = np.random.default_rng(1)
        truth = rng.normal(size=(2000,)).astype(np.float32)
        good = rng.normal(size=(2000, 16)).astype(np.float32)
        bad = good + 2.0
        c_good = float(np.mean(np.asarray(
            crps_ensemble(jnp.asarray(good), jnp.asarray(truth),
                          member_axis=-1))))
        c_bad = float(np.mean(np.asarray(
            crps_ensemble(jnp.asarray(bad), jnp.asarray(truth),
                          member_axis=-1))))
        assert c_good < c_bad


class TestSpreadErrorRankHist:
    def test_reliable_ensemble_spread_matches_rmse(self):
        rng = np.random.default_rng(2)
        b, m, leads = 4000, 15, 3
        truth = rng.normal(size=(b, leads)).astype(np.float32)
        mem = rng.normal(size=(b, m, leads)).astype(np.float32)
        rmse, spread = spread_error(jnp.asarray(mem), jnp.asarray(truth))
        rmse, spread = np.asarray(rmse), np.asarray(spread)
        assert rmse.shape == (leads,)
        # reliable ensemble: rmse ~= spread * sqrt((M+1)/M)
        np.testing.assert_allclose(
            rmse, spread * np.sqrt((m + 1) / m), rtol=0.05
        )

    def test_rank_histogram_flat_for_exchangeable(self):
        rng = np.random.default_rng(4)
        b, m = 20000, 4
        mem = rng.normal(size=(b, m, 1)).astype(np.float32)
        truth = rng.normal(size=(b, 1)).astype(np.float32)
        counts = np.asarray(rank_histogram(jnp.asarray(mem),
                                           jnp.asarray(truth)))
        assert counts.shape == (m + 1,)
        assert counts.sum() == b
        # exchangeable -> each rank ~ b/(m+1); allow 10% slack
        np.testing.assert_allclose(
            counts, b / (m + 1), rtol=0.1
        )

    def test_underdispersed_is_u_shaped(self):
        rng = np.random.default_rng(5)
        b, m = 5000, 6
        mem = (0.2 * rng.normal(size=(b, m, 1))).astype(np.float32)
        truth = rng.normal(size=(b, 1)).astype(np.float32)
        counts = np.asarray(rank_histogram(jnp.asarray(mem),
                                           jnp.asarray(truth)))
        assert counts[0] + counts[-1] > 0.5 * b
