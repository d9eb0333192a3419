"""Sequence (autoregressive multi-step) training mode tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.data import MemoryStore, SeriesDataset
from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
from dlwp_cs_tpu.rollout import make_rollout_fn
from dlwp_cs_tpu.train import (
    init_state,
    make_optimizer,
    make_sequence_loss,
    make_sequence_train_step,
)

N = 8
DCFG = DataConfig(
    grid_n=N,
    variables=("a", "b"),
    input_time_steps=2,
    output_time_steps=2,
    add_insolation=True,
    constants=(),
)


def _store(t=40, seed=0):
    rng = np.random.default_rng(seed)
    fields = rng.normal(size=(t, 6, N, N, 2)).astype(np.float32)
    return MemoryStore.from_raw(fields, np.arange(t) * 0.25, ("a", "b"))


def _grid():
    cs = CubedSphere(N)
    return cs.cell_latlon


class TestSequenceDataset:
    def test_batch_structure(self):
        lat, lon = _grid()
        ds = SeriesDataset(
            _store(), DCFG, lat=lat, lon=lon, batch_size=3, sequence=3
        )
        window, targets, t0 = next(iter(ds))
        assert window.shape == (3, 2, 6, N, N, 2)
        assert targets.shape == (3, 3, 6, N, N, 4)
        assert t0.shape == (3,)
        # t0 = time of last input step of each sample
        np.testing.assert_allclose(t0[0], 0.25)

    def test_sequence_targets_chain(self):
        # target window s must equal the samples at Tin + s*Tout offsets
        store = _store()
        lat, lon = _grid()
        ds = SeriesDataset(store, DCFG, lat=lat, lon=lon, batch_size=1, sequence=2)
        window, targets, t0 = ds.make_batch(np.array([4]))
        norm = (store.fields - store.mean) / store.std
        np.testing.assert_allclose(
            targets[0, 0, ..., :2], norm[6].astype(np.float32), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            targets[0, 1, ..., 2:], norm[9].astype(np.float32), rtol=1e-5, atol=1e-5
        )

    def test_bad_sequence_rejected(self):
        lat, lon = _grid()
        with pytest.raises(ValueError):
            SeriesDataset(_store(), DCFG, lat=lat, lon=lon, sequence=0)

    def test_channels_first_rejected_in_sequence_mode(self):
        """Round 5: the flag used to be silently ignored — sequence batches
        came back channels-last regardless."""
        lat, lon = _grid()
        with pytest.raises(ValueError, match="channels_last"):
            SeriesDataset(_store(), DCFG, lat=lat, lon=lon, sequence=2,
                          channels_last=False)


class TestSequenceTraining:
    def _setup(self, sequence=2):
        lat, lon = _grid()
        model = CubeSphereUNet(
            UNetConfig(output_channels=DCFG.output_channels, filters=(4, 8))
        )
        x0 = jnp.zeros((1, 6, N, N, DCFG.input_channels))
        params = model.init(jax.random.PRNGKey(0), x0)
        opt = make_optimizer(TrainConfig(learning_rate=1e-2))
        loss = make_sequence_loss(
            model.apply,
            DCFG,
            lat=lat,
            lon=lon,
            insol_mean=300.0,
            insol_std=400.0,
            sequence=sequence,
        )
        return model, params, opt, loss, (lat, lon)

    def test_loss_finite_and_trainable(self):
        model, params, opt, loss, _ = self._setup()
        store = _store()
        lat, lon = _grid()
        ds = SeriesDataset(store, DCFG, lat=lat, lon=lon, batch_size=4, sequence=2)
        step = make_sequence_train_step(loss, opt)
        state = init_state(params, opt)
        window, targets, t0 = next(iter(ds))
        losses = []
        for _ in range(12):
            state, m = step(state, jnp.asarray(window), jnp.asarray(t0), jnp.asarray(targets))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_sequence1_loss_matches_direct_prediction(self):
        # k=1 sequence loss == plain MSE of one packed forward pass
        model, params, opt, loss, (lat, lon) = self._setup(sequence=1)
        store = _store(seed=3)
        ds = SeriesDataset(store, DCFG, lat=lat, lon=lon, batch_size=2, sequence=1)
        window, targets, t0 = ds.make_batch(np.array([0, 1]))
        v = float(loss(params, jnp.asarray(window), jnp.asarray(t0), jnp.asarray(targets)))

        from dlwp_cs_tpu.data import pack_inputs
        from dlwp_cs_tpu.geometry import insolation

        times = t0[:, None] + (np.arange(2) - 1) * 0.25
        ins = (
            insolation(jnp.asarray(times)[..., None, None, None],
                       jnp.asarray(lat), jnp.asarray(lon))
            - 300.0
        ) / 400.0
        inputs = pack_inputs(jnp.asarray(window), ins)
        pred = model.apply(params, inputs)
        ref = float(jnp.mean(jnp.square(pred - jnp.asarray(targets[:, 0]))))
        assert v == pytest.approx(ref, rel=1e-5)

    def test_sharded_step_matches_single_device(self):
        """DP x spatial sequence step == single-device step (VERDICT r1 #4):
        params/loss must agree when the batch is data-parallel and face rows
        are domain-decomposed, with constants and per-shard insolation."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from dlwp_cs_tpu.parallel import create_mesh
        from dlwp_cs_tpu.train import make_sharded_sequence_train_step

        lat, lon = _grid()
        dcfg = DataConfig(
            grid_n=N,
            variables=("a", "b"),
            input_time_steps=2,
            output_time_steps=2,
            add_insolation=True,
            constants=("topo",),
        )
        consts = jnp.asarray(
            np.random.default_rng(9).normal(size=(6, N, N, 1)).astype(np.float32)
        )
        model = CubeSphereUNet(
            UNetConfig(output_channels=dcfg.output_channels, filters=(4, 8))
        )
        x0 = jnp.zeros((1, 6, N, N, dcfg.input_channels))
        params = model.init(jax.random.PRNGKey(0), x0)
        opt = make_optimizer(TrainConfig(learning_rate=1e-2))
        rng = np.random.default_rng(11)
        window = jnp.asarray(rng.normal(size=(4, 2, 6, N, N, 2)).astype(np.float32))
        targets = jnp.asarray(rng.normal(size=(4, 3, 6, N, N, 4)).astype(np.float32))
        t0 = jnp.asarray([1.0, 1.25, 50.5, 117.75], jnp.float32)

        kw = dict(
            lat=lat, lon=lon, constants=consts,
            insol_mean=300.0, insol_std=400.0, sequence=3,
        )
        loss = make_sequence_loss(model.apply, dcfg, **kw)
        ref_step = make_sequence_train_step(loss, opt)
        ref_state, ref_m = ref_step(
            init_state(jax.tree.map(jnp.copy, params), opt), window, t0, targets
        )

        for mesh_kw in ({"data": 2, "spatial": 4},
                        {"data": 2, "spatial": 2, "spatial_x": 2}):
            mesh = create_mesh(**mesh_kw)
            sh_step = make_sharded_sequence_train_step(
                model.apply, dcfg, opt, mesh, **kw
            )
            state, m = sh_step(
                init_state(jax.tree.map(jnp.copy, params), opt), window, t0,
                targets,
            )
            assert float(m["loss"]) == pytest.approx(
                float(ref_m["loss"]), rel=1e-5
            ), mesh_kw
            for a, b in zip(
                jax.tree.leaves(state.params), jax.tree.leaves(ref_state.params)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-4,
                    err_msg=str(mesh_kw),
                )

    def test_matches_rollout_rewiring(self):
        # the sequence loss's internal rollout must equal make_rollout_fn's
        model, params, opt, _, (lat, lon) = self._setup()
        rollout = make_rollout_fn(
            model.apply,
            DCFG,
            lat=lat,
            lon=lon,
            insol_mean=300.0,
            insol_std=400.0,
            steps=2,
        )
        window = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 2, 6, N, N, 2)).astype(np.float32)
        )
        t0 = 5.25
        fc = rollout(params, window, t0)
        # zero loss against its own rollout outputs
        loss = make_sequence_loss(
            model.apply,
            DCFG,
            lat=lat,
            lon=lon,
            insol_mean=300.0,
            insol_std=400.0,
            sequence=2,
        )
        from dlwp_cs_tpu.data import fold_time

        out = fc.fields.reshape(2, 2, 2, 6, N, N, 2)  # (B, seq, Tout, ...)
        targets = jnp.stack(
            [fold_time(out[:, s]) for s in range(2)], axis=1
        )
        v = float(
            loss(params, window, jnp.full((2,), t0, jnp.float32), targets)
        )
        assert v == pytest.approx(0.0, abs=1e-9)
