"""Torch-mirror oracle tests: the CPU torch backend must reproduce the JAX
cubed-sphere padding/conv/U-Net numerics from the same neutral param tree
(SURVEY.md §2 row 8 — ``DLWPTorchNN`` parity, redesigned as a
cross-framework allclose oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dlwp_cs_tpu.models import CubeSphereUNet, UNetConfig
from dlwp_cs_tpu.models.torch_mirror import (
    TorchCubeSphereConv2D,
    TorchCubeSphereUNet,
    torch_cs_pad,
)
from dlwp_cs_tpu.ops.conv import cs_conv
from dlwp_cs_tpu.ops.padding import cs_pad

N = 8


def _x(b=2, c=3, n=N, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, 6, n, n, c)).astype(np.float32)


class TestPadParity:
    @pytest.mark.parametrize("width", [1, 2])
    def test_matches_jax(self, width):
        x = _x()
        ours = torch_cs_pad(torch.from_numpy(x), width).numpy()
        ref = np.asarray(cs_pad(jnp.asarray(x), width))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestConvParity:
    def test_grouped_conv_matches_jax(self):
        rng = np.random.default_rng(1)
        x = _x(c=4)
        k_eq = rng.normal(size=(3, 3, 4, 5)).astype(np.float32) * 0.1
        k_po = rng.normal(size=(3, 3, 4, 5)).astype(np.float32) * 0.1
        b_eq = rng.normal(size=(5,)).astype(np.float32)
        b_po = rng.normal(size=(5,)).astype(np.float32)
        ours = TorchCubeSphereConv2D(k_eq, k_po, b_eq, b_po)(
            torch.from_numpy(x)
        ).numpy()
        ref = np.asarray(
            cs_conv(
                jnp.asarray(x),
                jnp.asarray(k_eq),
                jnp.asarray(k_po),
                bias_eq=jnp.asarray(b_eq),
                bias_pole=jnp.asarray(b_po),
                backend="xla",
            )
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestUNetParity:
    def test_full_model_matches_flax(self):
        cfg = UNetConfig(output_channels=2, filters=(4, 8))
        model = CubeSphereUNet(cfg)
        x = _x(c=3)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ref = np.asarray(model.apply(params, jnp.asarray(x)))

        mirror = TorchCubeSphereUNet(cfg).load_flax_params(
            jax.tree_util.tree_map(np.asarray, params)
        )
        ours = mirror(x).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_requires_loaded_params(self):
        with pytest.raises(RuntimeError, match="load_flax_params"):
            TorchCubeSphereUNet(UNetConfig(filters=(4,)))(_x())
