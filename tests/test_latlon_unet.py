"""Legacy lat-lon U-Net + async checkpoint tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import LatLonConv2D, LatLonUNet, UNetConfig
from dlwp_cs_tpu.utils import (
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)


class TestLatLonUNet:
    def test_forward_and_grad(self):
        cfg = UNetConfig(output_channels=3, filters=(4, 8))
        model = LatLonUNet(cfg)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 16, 32, 5)).astype(np.float32)
        )
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 16, 32, 3)
        g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))

    def test_longitude_periodicity(self):
        # rolling the input in longitude must roll the output identically
        cfg = UNetConfig(output_channels=2, filters=(4,))
        model = LatLonUNet(cfg)
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 8, 16, 3)).astype(np.float32)
        )
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        out_rolled = model.apply(params, jnp.roll(x, 5, axis=2))
        np.testing.assert_allclose(
            np.asarray(out_rolled),
            np.asarray(jnp.roll(out, 5, axis=2)),
            rtol=2e-4,
            atol=2e-5,
        )

    def test_indivisible_rejected(self):
        cfg = UNetConfig(output_channels=2, filters=(4, 8))
        model = LatLonUNet(cfg)
        with pytest.raises(ValueError):
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 16, 3)))

    def test_conv_layer_shapes(self):
        m = LatLonConv2D(features=6)
        x = jnp.zeros((2, 8, 16, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (2, 8, 16, 6)


class TestAsyncCheckpoint:
    def test_background_save_roundtrip(self, tmp_path):
        state = {"a": jnp.arange(8.0), "b": {"c": jnp.ones((3, 3))}}
        save_checkpoint(tmp_path, state, step=5, background=True)
        wait_for_checkpoints()
        template = {"a": jnp.zeros(8), "b": {"c": jnp.zeros((3, 3))}}
        restored, _ = restore_checkpoint(tmp_path, template)
        np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(8.0))
        np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), np.ones((3, 3)))
