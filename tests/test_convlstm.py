"""Recurrent (ConvLSTM) model family tests.

Covers the reference's ``is_recurrent`` capability (SURVEY.md §2 rows 5-6):
cell math, scan-vs-loop equivalence, stateful continuation (the functional
``RNNResetStates`` contract), the folded-channel drop-in network, config
serialization and estimator integration.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.data import MemoryStore
from dlwp_cs_tpu.data.channels import pack_inputs
from dlwp_cs_tpu.estimator import DLWPEstimator
from dlwp_cs_tpu.models import (
    ConvLSTMConfig,
    CubeSphereConvLSTM,
    CubeSphereConvLSTMCell,
    CubeSphereConvLSTMNet,
    DataConfig,
    ExperimentConfig,
    LatLonConvLSTMCell,
    TrainConfig,
    build_model,
    get_layer,
)

N = 8


def _seq(b=2, t=3, c=2, n=N, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, t, 6, n, n, c)).astype(np.float32))


class TestCell:
    def test_step_shapes_and_state_update(self):
        cell = CubeSphereConvLSTMCell(features=5)
        x = _seq()[:, 0]
        carry0 = cell.initialize_carry(x)
        params = cell.init(jax.random.PRNGKey(0), carry0, x)
        (h, c), out = cell.apply(params, carry0, x)
        assert h.shape == (2, 6, N, N, 5)
        assert c.shape == (2, 6, N, N, 5)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(h))
        # zero carry + nonzero input must move the state
        assert float(jnp.abs(h).max()) > 0

    def test_cell_dtype_differs_from_input_dtype(self):
        """Round 5: h_new was cast to x.dtype for the carry, so a bf16-cell
        scan over f32 inputs raised lax.scan's carry-dtype mismatch."""
        cell = CubeSphereConvLSTMCell(features=4, dtype=jnp.bfloat16)
        x = _seq()[:, 0]  # float32 step input
        carry0 = cell.initialize_carry(x)
        params = cell.init(jax.random.PRNGKey(0), carry0, x)
        (h, c), out = cell.apply(params, carry0, x)
        assert h.dtype == carry0[0].dtype == jnp.bfloat16
        assert c.dtype == carry0[1].dtype
        assert out.dtype == x.dtype

    def test_latlon_cell(self):
        cell = LatLonConvLSTMCell(features=3)
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 5, 8, 2)).astype(np.float32)
        )
        carry0 = cell.initialize_carry(x)
        params = cell.init(jax.random.PRNGKey(0), carry0, x)
        (h, c), _ = cell.apply(params, carry0, x)
        assert h.shape == (2, 5, 8, 3)


class TestLayer:
    def test_scan_equals_python_loop(self):
        xs = _seq()
        layer = CubeSphereConvLSTM(features=4, return_sequences=True)
        params = layer.init(jax.random.PRNGKey(0), xs)
        hs = layer.apply(params, xs)
        assert hs.shape == (2, 3, 6, N, N, 4)

        # Re-run the same weights through an explicit python loop over the
        # bound cell; nn.scan must match step for step.
        cell = CubeSphereConvLSTMCell(features=4)
        cell_params = {"params": params["params"]["cell"]}
        carry = cell.initialize_carry(xs[:, 0])
        for t in range(xs.shape[1]):
            carry, h = cell.apply(cell_params, carry, xs[:, t])
            np.testing.assert_allclose(
                np.asarray(h), np.asarray(hs[:, t]), atol=1e-5
            )

    def test_final_state_mode(self):
        xs = _seq()
        layer = CubeSphereConvLSTM(features=4, return_sequences=False)
        params = layer.init(jax.random.PRNGKey(0), xs)
        h = layer.apply(params, xs)
        assert h.shape == (2, 6, N, N, 4)

    def test_stateful_continuation(self):
        """Feeding a carry forward == one longer sequence (Keras 'stateful');
        omitting it == RNNResetStates."""
        xs = _seq(t=4)
        layer = CubeSphereConvLSTM(features=4, return_sequences=True)
        params = layer.init(jax.random.PRNGKey(0), xs)
        full = layer.apply(params, xs)

        first, carry = layer.apply(params, xs[:, :2], return_carry=True)
        second = layer.apply(params, xs[:, 2:], carry)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([first, second], axis=1)),
            np.asarray(full),
            atol=1e-5,
        )
        # reset: a fresh call does NOT equal the continuation
        reset = layer.apply(params, xs[:, 2:])
        assert not np.allclose(np.asarray(reset), np.asarray(second), atol=1e-4)

    def test_registry_entry(self):
        assert get_layer("CubeSphereConvLSTM") is CubeSphereConvLSTM


class TestNet:
    def _cfg(self, **kw):
        base = dict(
            output_channels=4,
            filters=(4, 4),
            input_time_steps=2,
            variable_channels=2,
            add_insolation=True,
        )
        base.update(kw)
        return ConvLSTMConfig(**base)

    def _folded(self, cfg, b=2, k=1, seed=0):
        rng = np.random.default_rng(seed)
        window = rng.normal(size=(b, cfg.input_time_steps, 6, N, N, 2))
        insol = rng.normal(size=(b, cfg.input_time_steps, 6, N, N))
        const = rng.normal(size=(6, N, N, k))
        return pack_inputs(
            jnp.asarray(window.astype(np.float32)),
            jnp.asarray(insol.astype(np.float32)),
            jnp.asarray(const.astype(np.float32)),
        )

    def test_forward_shape_and_grads(self):
        cfg = self._cfg()
        net = CubeSphereConvLSTMNet(cfg)
        x = self._folded(cfg)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (2, 6, N, N, 4)
        assert y.dtype == jnp.float32

        def loss(p):
            return jnp.mean(net.apply(p, x) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_bf16_compute(self):
        cfg = self._cfg(compute_dtype="bfloat16")
        net = CubeSphereConvLSTMNet(cfg)
        x = self._folded(cfg)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.dtype == jnp.float32
        assert np.isfinite(np.asarray(y)).all()

    def test_channel_mismatch_rejected(self):
        cfg = self._cfg(variable_channels=8)
        net = CubeSphereConvLSTMNet(cfg)
        x = self._folded(self._cfg())  # too few channels for cv=8
        with pytest.raises(ValueError, match="input channels"):
            net.init(jax.random.PRNGKey(0), x)


class TestConfigAndEstimator:
    def _experiment(self):
        return ExperimentConfig(
            data=DataConfig(
                grid_n=N, variables=("z500", "t2m"), constants=("topography",)
            ),
            model=ConvLSTMConfig(filters=(4,)),
            train=TrainConfig(batch_size=4, max_epochs=1, learning_rate=1e-3),
        )

    def test_json_roundtrip_discriminates_kind(self):
        cfg = self._experiment()
        back = ExperimentConfig.from_json(cfg.to_json())
        assert isinstance(back.model, ConvLSTMConfig)
        assert back == cfg

    def test_resolved_model_fills_data_fields(self):
        cfg = self._experiment()
        resolved = cfg.resolved_model()
        assert resolved.output_channels == cfg.data.output_channels
        assert resolved.input_time_steps == cfg.data.input_time_steps
        assert resolved.variable_channels == 2
        assert resolved.add_insolation is True
        assert isinstance(build_model(resolved), CubeSphereConvLSTMNet)

    def test_estimator_fit_forecast_save_load(self, tmp_path):
        rng = np.random.default_rng(0)
        fields = rng.normal(size=(20, 6, N, N, 2)).astype(np.float32)
        consts = rng.normal(size=(6, N, N, 1)).astype(np.float32)
        store = MemoryStore.from_raw(
            fields,
            np.arange(20) * 0.25,
            ("z500", "t2m"),
            constants=consts,
            constant_names=("topography",),
        )
        est = DLWPEstimator(self._experiment())
        est.fit(store, verbose=False)
        fc = est.forecast(store, init_indices=[4, 5], steps=2)
        assert fc.fields.shape == (2, 4, 6, N, N, 2)
        assert np.isfinite(np.asarray(fc.fields)).all()

        est.save(tmp_path / "m")
        back = DLWPEstimator.load(tmp_path / "m")
        assert isinstance(back.model, CubeSphereConvLSTMNet)
        fc2 = back.forecast(store, init_indices=[4, 5], steps=2)
        np.testing.assert_allclose(
            np.asarray(fc.fields), np.asarray(fc2.fields), atol=1e-5
        )


class TestShardedConvLSTM:
    """The recurrent family under the spatial (shard_map) decomposition:
    the in-scan cs_conv calls pick up the sharded halo exchange via the
    installed pad impl, so the family shards like the U-Net."""

    @pytest.fixture(scope="class")
    def eight_devices(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        return jax.devices()[:8]

    def test_spatial_apply_matches_single_device(self, eight_devices):
        from dlwp_cs_tpu.parallel import create_mesh, make_spatial_apply

        cfg = ConvLSTMConfig(
            output_channels=4,
            filters=(4, 4),
            input_time_steps=2,
            variable_channels=2,
            add_insolation=True,
        )
        net = CubeSphereConvLSTMNet(cfg)
        rng = np.random.default_rng(7)
        x = jnp.asarray(
            rng.normal(size=(2, 6, 16, 16, 2 * 2 + 2 + 1)).astype(np.float32)
        )
        params = net.init(jax.random.PRNGKey(2), x)
        ref = np.asarray(net.apply(params, x))
        mesh = create_mesh(data=2, spatial=4)
        out = np.asarray(make_spatial_apply(net.apply, mesh)(params, x))
        np.testing.assert_allclose(out, ref, atol=5e-5)
