"""Model tests: UNet forward, param grouping, config round-trip, registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import (
    CubeSphereConv2D,
    CubeSphereUNet,
    DataConfig,
    ExperimentConfig,
    SequentialSpec,
    UNetConfig,
    freeze_spec,
    get_layer,
)


def _init_and_apply(model, x, seed=0):
    params = model.init(jax.random.PRNGKey(seed), x)
    return params, model.apply(params, x)


class TestCubeSphereConv2DLayer:
    def test_params_and_shape(self):
        x = jnp.zeros((2, 6, 8, 8, 3))
        m = CubeSphereConv2D(features=5)
        params, out = _init_and_apply(m, x)
        assert out.shape == (2, 6, 8, 8, 5)
        names = set(params["params"].keys())
        assert names == {"kernel_eq", "kernel_pole", "bias_eq", "bias_pole"}

    def test_shared_weights_mode(self):
        x = jnp.zeros((2, 6, 8, 8, 3))
        m = CubeSphereConv2D(features=5, separate_polar_weights=False)
        params, _ = _init_and_apply(m, x)
        assert set(params["params"].keys()) == {"kernel_eq", "bias_eq"}

    def test_bf16_compute_f32_params(self):
        x = jnp.ones((1, 6, 8, 8, 2))
        m = CubeSphereConv2D(features=3, dtype=jnp.bfloat16)
        params, out = _init_and_apply(m, x)
        assert params["params"]["kernel_eq"].dtype == jnp.float32
        assert out.dtype == jnp.bfloat16


class TestUNet:
    def test_forward_shapes_c24(self):
        cfg = UNetConfig(output_channels=8, filters=(8, 16, 32))
        x = jnp.zeros((2, 6, 24, 24, 12))
        model = CubeSphereUNet(cfg)
        params, out = _init_and_apply(model, x)
        assert out.shape == (2, 6, 24, 24, 8)
        assert out.dtype == jnp.float32

    def test_param_count_reasonable(self):
        cfg = UNetConfig(output_channels=8, filters=(32, 64, 128))
        x = jnp.zeros((1, 6, 24, 24, 12))
        params = CubeSphereUNet(cfg).init(jax.random.PRNGKey(0), x)
        n = sum(p.size for p in jax.tree.leaves(params))
        # Weyn et al. 2020-scale: O(1e5..1e7) params with polar+equatorial groups
        assert 1e5 < n < 2e7

    def test_bf16_path_runs(self):
        cfg = UNetConfig(output_channels=2, filters=(4, 8), compute_dtype="bfloat16")
        x = jnp.ones((1, 6, 8, 8, 3))
        _, out = _init_and_apply(CubeSphereUNet(cfg), x)
        assert out.dtype == jnp.float32  # head casts back
        assert np.isfinite(np.asarray(out)).all()

    def test_grad_through_unet(self):
        cfg = UNetConfig(output_channels=2, filters=(4, 8))
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 6, 8, 8, 3)).astype(np.float32)
        )
        model = CubeSphereUNet(cfg)
        params = model.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

    def test_indivisible_grid_rejected(self):
        cfg = UNetConfig(output_channels=2, filters=(4, 8, 16))
        x = jnp.zeros((1, 6, 10, 10, 3))
        with pytest.raises(ValueError):
            CubeSphereUNet(cfg).init(jax.random.PRNGKey(0), x)


class TestConfig:
    def test_channel_derivation(self):
        d = DataConfig(
            variables=("z500", "z1000", "tau", "t2m"),
            input_time_steps=2,
            output_time_steps=2,
            add_insolation=True,
            constants=("topo", "lsm"),
        )
        assert d.input_channels == 2 * 4 + 2 + 2
        assert d.output_channels == 8

    def test_json_roundtrip(self):
        cfg = ExperimentConfig()
        text = cfg.to_json()
        back = ExperimentConfig.from_json(text)
        assert back == cfg

    def test_unknown_field_rejected(self):
        with pytest.raises(ValueError):
            ExperimentConfig.from_json('{"data": {"nope": 1}}')

    def test_resolved_model(self):
        cfg = ExperimentConfig()
        assert cfg.resolved_model().output_channels == cfg.data.output_channels


class TestRegistry:
    def test_get_layer_known_and_unknown(self):
        assert get_layer("CubeSphereConv2D") is CubeSphereConv2D
        with pytest.raises(KeyError):
            get_layer("FluxCapacitor")

    def test_sequential_spec_runs(self):
        spec = freeze_spec(
            [
                ("CubeSphereConv2D", (), {"features": 4}),
                ("LeakyReLU", (), {"negative_slope": 0.1}),
                ("AvgPool", (2,), {}),
                ("UpSampling", (2,), {}),
                ("CubeSphereConv2D", (), {"features": 2, "kernel_size": (1, 1)}),
            ]
        )
        model = SequentialSpec(spec=spec)
        x = jnp.zeros((1, 6, 8, 8, 3))
        params, out = _init_and_apply(model, x)
        assert out.shape == (1, 6, 8, 8, 2)


@pytest.mark.parametrize(
    "batch,filters",
    [
        (4, (4, 8)),
        # flagship-like channel ratios: the decoder block's concat-fed first
        # conv packs less than its second conv, exercising the mid-block
        # repack path (dec0 input 36ch -> p=2, second conv 4ch -> p=8)
        (8, (4, 32)),
    ],
)
def test_unet_block_lane_packing_equivalence(batch, filters):
    """Packed-resident conv blocks (lane_pack) are the exact same network:
    forward and grads match the unpacked trace with identical params."""
    import jax

    from dlwp_cs_tpu.ops.ringfix import use_packed_base

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(batch, 6, 8, 8, 7)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(batch, 6, 8, 8, 4)).astype(np.float32))
    model = CubeSphereUNet(UNetConfig(output_channels=4, filters=filters))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p, v):
        return jnp.mean((model.apply(p, v) - y) ** 2)

    with use_packed_base(False):
        ref = model.apply(params, x)
        gref = jax.grad(loss)(params, x)
    with use_packed_base(True):
        out = model.apply(params, x)
        gout = jax.grad(loss)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gout), jax.tree.leaves(gref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
