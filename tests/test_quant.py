"""Quantized int8 conv path: exactness, error bounds, serving integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import CubeSphereUNet, UNetConfig
from dlwp_cs_tpu.ops.conv import cs_conv
from dlwp_cs_tpu.ops.quant import cs_conv3x3_int8, quantize_kernel, quantize_tensor

N = 8


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32) * scale
    )


class TestQuantPrimitives:
    def test_quantize_tensor_roundtrip_bound(self):
        x = _rand((2, 6, N, N, 4), seed=1, scale=3.0)
        q, s = quantize_tensor(x)
        assert q.dtype == jnp.int8
        err = np.max(np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x)))
        assert err <= float(s) / 2 + 1e-6  # round-to-nearest half-ulp

    def test_quantize_kernel_per_channel(self):
        k = _rand((3, 3, 4, 5), seed=2)
        # make channel 3 much larger: its scale must not pollute others
        k = k.at[..., 3].multiply(100.0)
        q, s = quantize_kernel(k)
        assert s.shape == (5,)
        back = np.asarray(q, np.float32) * np.asarray(s)
        np.testing.assert_allclose(back, np.asarray(k), atol=float(s[3]) / 2 + 1e-6)
        assert float(s[3]) > 10 * float(s[0])

    def test_zero_input_no_nan(self):
        x = jnp.zeros((1, 6, N, N, 3))
        k = _rand((3, 3, 3, 4), seed=3)
        out = cs_conv3x3_int8(x, k, k)
        assert np.isfinite(np.asarray(out)).all()
        # SAME conv of zeros + ring term of zeros == 0
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestInt8Conv:
    def test_exact_on_integer_data(self):
        """With activations/weights that quantize losslessly (integers, amax
        pinned to 127) the int8 path must equal the f32 ring-fix exactly."""
        rng = np.random.default_rng(0)
        x = rng.integers(-127, 128, size=(2, 6, N, N, 3)).astype(np.float32)
        x[0, 0, 0, 0, 0] = 127.0  # pin per-tensor amax -> scale exactly 1
        k_eq = rng.integers(-127, 128, size=(3, 3, 3, 4)).astype(np.float32)
        k_po = rng.integers(-127, 128, size=(3, 3, 3, 4)).astype(np.float32)
        k_eq[0, 0, 0, :] = 127.0  # pin per-channel amax
        k_po[0, 0, 0, :] = 127.0
        got = cs_conv3x3_int8(jnp.asarray(x), jnp.asarray(k_eq), jnp.asarray(k_po))
        want = cs_conv(
            jnp.asarray(x), jnp.asarray(k_eq), jnp.asarray(k_po),
            backend="ringfix",
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-2)

    def test_error_bound_random(self):
        x = _rand((2, 6, N, N, 8), seed=4)
        k_eq = _rand((3, 3, 8, 8), seed=5, scale=0.2)
        k_po = _rand((3, 3, 8, 8), seed=6, scale=0.2)
        b_eq = _rand((8,), seed=7)
        got = np.asarray(
            cs_conv3x3_int8(x, k_eq, k_po, bias_eq=b_eq, bias_pole=b_eq)
        )
        want = np.asarray(
            cs_conv(x, k_eq, k_po, bias_eq=b_eq, bias_pole=b_eq,
                    backend="ringfix")
        )
        # quantization noise per conv: ~(amax_x/127) * sum|k| — a few
        # percent of the output scale at these magnitudes
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 0.05, rel

    def test_backend_dispatch(self):
        x = _rand((1, 6, N, N, 3), seed=8)
        k = _rand((3, 3, 3, 4), seed=9)
        via_backend = cs_conv(x, k, k, backend="int8")
        direct = cs_conv3x3_int8(x, k, k)
        np.testing.assert_allclose(
            np.asarray(via_backend), np.asarray(direct), atol=1e-6
        )

    def test_jittable(self):
        x = _rand((1, 6, N, N, 3), seed=10)
        k = _rand((3, 3, 3, 4), seed=11)
        jitted = jax.jit(lambda x, k: cs_conv3x3_int8(x, k, k))
        np.testing.assert_allclose(
            np.asarray(jitted(x, k)), np.asarray(cs_conv3x3_int8(x, k, k)),
            atol=1e-6,
        )


class TestInt8Model:
    def test_unet_int8_close_to_f32(self):
        cfg = UNetConfig(output_channels=2, filters=(4, 8))
        cfg_q = UNetConfig(output_channels=2, filters=(4, 8),
                           conv_backend="int8")
        model, model_q = CubeSphereUNet(cfg), CubeSphereUNet(cfg_q)
        x = _rand((2, 6, N, N, 3), seed=12)
        params = model.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(model.apply(params, x))
        got = np.asarray(model_q.apply(params, x))
        assert np.isfinite(got).all()
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.1, rel


class TestQuantizedServing:
    def test_service_quantize_matches_loosely(self):
        from tests.test_serve import _raw_window, _store
        from dlwp_cs_tpu.estimator import DLWPEstimator
        from dlwp_cs_tpu.models import DataConfig, ExperimentConfig, TrainConfig
        from dlwp_cs_tpu.serve import ForecastService

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
        svc = ForecastService(est, constants_store=store)
        svc_q = ForecastService(est, constants_store=store, quantize=True)
        assert svc_q.quantized and not svc.quantized
        w = _raw_window(store, 6)
        fc = svc.forecast(w, store.times[6], steps=3)
        fc_q = svc_q.forecast(w, store.times[6], steps=3)
        ref = np.asarray(fc.fields)
        got = np.asarray(fc_q.fields)
        assert np.isfinite(got).all()
        # autoregressive quantization drift stays a small fraction of the
        # field scale over 3 calls (6 steps)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.2, rel
