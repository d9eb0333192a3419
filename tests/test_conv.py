"""Cubed-sphere convolution, pooling, lat-lon ops, and loss tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.ops import (
    anomaly_correlation,
    cs_avg_pool,
    cs_conv,
    cs_max_pool,
    cs_upsample,
    latitude_weighted_loss,
    latlon_conv,
    mse,
    periodic_pad,
    weighted_mse,
)


def _rand(shape, seed=0, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(dtype))


class TestCsConv:
    def test_identity_1x1(self):
        x = _rand((2, 6, 8, 8, 3))
        k = jnp.eye(3).reshape(1, 1, 3, 3)
        out = cs_conv(x, k, k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_interior_matches_plain_conv(self):
        # Away from face edges the halo is irrelevant: per-face VALID conv on
        # the unpadded tensor must agree exactly with the interior of cs_conv.
        x = _rand((2, 6, 12, 12, 4), seed=1)
        k_eq = _rand((3, 3, 4, 5), seed=2)
        k_po = _rand((3, 3, 4, 5), seed=3)
        out = np.asarray(cs_conv(x, k_eq, k_po))
        for group, k in ((range(4), k_eq), (range(4, 6), k_po)):
            for f in group:
                ref = lax.conv_general_dilated(
                    x[:, f],
                    k,
                    (1, 1),
                    "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                np.testing.assert_allclose(
                    out[:, f, 1:-1, 1:-1], np.asarray(ref), rtol=1e-4, atol=1e-5
                )

    def test_constant_field(self):
        # Constant in, constant out everywhere (edges + corners included):
        # the sharpest test that the halo has no holes.
        x = jnp.full((1, 6, 8, 8, 2), 1.5)
        k = _rand((3, 3, 2, 3), seed=4)
        out = np.asarray(cs_conv(x, k, k))
        expect = 1.5 * np.asarray(k).sum(axis=(0, 1, 2))
        np.testing.assert_allclose(out, np.broadcast_to(expect, out.shape), rtol=1e-4)

    def test_weight_groups_route_to_faces(self):
        x = jnp.ones((1, 6, 8, 8, 1))
        k_eq = jnp.full((1, 1, 1, 1), 2.0)
        k_po = jnp.full((1, 1, 1, 1), 5.0)
        out = np.asarray(cs_conv(x, k_eq, k_po))
        assert np.all(out[:, :4] == 2.0)
        assert np.all(out[:, 4:] == 5.0)

    def test_stride_and_bias(self):
        x = _rand((1, 6, 8, 8, 2), seed=5)
        k = _rand((3, 3, 2, 4), seed=6)
        b = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        out = cs_conv(x, k, k, bias_eq=b, bias_pole=b, stride=2)
        assert out.shape == (1, 6, 4, 4, 4)

    def test_dilation(self):
        x = _rand((1, 6, 12, 12, 2), seed=7)
        k = _rand((3, 3, 2, 2), seed=8)
        out = cs_conv(x, k, k, dilation=2)
        assert out.shape == (1, 6, 12, 12, 2)

    def test_grad_flows(self):
        x = _rand((1, 6, 8, 8, 2), seed=9)
        k = _rand((3, 3, 2, 2), seed=10)

        def loss(k):
            return jnp.sum(cs_conv(x, k, k) ** 2)

        g = jax.grad(loss)(k)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_even_kernel_rejected(self):
        x = jnp.zeros((1, 6, 8, 8, 1))
        k = jnp.zeros((2, 2, 1, 1))
        with pytest.raises(ValueError):
            cs_conv(x, k, k)


class TestPooling:
    def test_avg_pool_exact(self):
        x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4, 1))
        x = jnp.tile(x, (1, 6, 1, 1, 1))
        out = np.asarray(cs_avg_pool(x, 2))
        assert out.shape == (1, 6, 2, 2, 1)
        np.testing.assert_allclose(out[0, 0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]])

    def test_max_pool(self):
        x = _rand((2, 6, 8, 8, 3), seed=11)
        out = np.asarray(cs_max_pool(x, 2))
        assert out.shape == (2, 6, 4, 4, 3)
        assert out.max() == pytest.approx(float(np.asarray(x).max()))

    def test_upsample_nearest_roundtrip(self):
        x = _rand((1, 6, 4, 4, 2), seed=12)
        up = cs_upsample(x, 2)
        assert up.shape == (1, 6, 8, 8, 2)
        down = cs_avg_pool(up, 2)
        np.testing.assert_allclose(np.asarray(down), np.asarray(x), atol=1e-6)

    def test_upsample_bilinear_shape(self):
        x = _rand((1, 6, 4, 4, 2), seed=13)
        up = cs_upsample(x, 2, method="bilinear")
        assert up.shape == (1, 6, 8, 8, 2)

    def test_indivisible_rejected(self):
        with pytest.raises(ValueError):
            cs_avg_pool(jnp.zeros((1, 6, 5, 5, 1)), 2)


class TestLatLon:
    def test_periodic_wrap(self):
        x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1))
        p = np.asarray(periodic_pad(x, 1))[0, :, :, 0]
        # lon wrap: left ghost = rightmost col
        np.testing.assert_array_equal(p[1:-1, 0], np.asarray(x)[0, :, -1, 0])
        np.testing.assert_array_equal(p[1:-1, -1], np.asarray(x)[0, :, 0, 0])

    def test_conv_same_shape(self):
        x = _rand((2, 8, 16, 3), seed=14)
        k = _rand((3, 3, 3, 5), seed=15)
        out = latlon_conv(x, k)
        assert out.shape == (2, 8, 16, 5)

    def test_polar_ghost_row_alignment(self):
        """Round 5: the over-pole ghost row is the boundary row rolled by
        half the ORIGINAL longitudes — rolling after the lon wrap produced
        duplicated/misaligned seam cells."""
        W = 8
        x = jnp.asarray(np.arange(W, dtype=np.float32).reshape(1, 1, W, 1))
        x = jnp.concatenate([x, x + 10.0], axis=1)  # H=2
        p = np.asarray(periodic_pad(x, (1, 1), lat_mode="polar"))[0, :, :, 0]
        # top ghost: row 0 ([0..7]) rolled by W//2 = [4,5,6,7,0,1,2,3],
        # then lon-wrapped
        np.testing.assert_array_equal(
            p[0], [3, 4, 5, 6, 7, 0, 1, 2, 3, 4]
        )
        np.testing.assert_array_equal(
            p[-1], np.asarray([3, 4, 5, 6, 7, 0, 1, 2, 3, 4]) + 10.0
        )

    def test_nonsquare_kernel_same_shape(self):
        """Round 5: cs_conv padded BOTH axes by the max halo, so a 3x1
        kernel emitted (n, n+2) outputs, breaking the 'same' contract."""
        x = _rand((1, 6, 8, 8, 2), seed=44)
        k31 = _rand((3, 1, 2, 4), seed=45)
        k13 = _rand((1, 3, 2, 4), seed=46)
        assert cs_conv(x, k31, k31, backend="xla").shape == (1, 6, 8, 8, 4)
        assert cs_conv(x, k13, k13, backend="xla").shape == (1, 6, 8, 8, 4)
        # interior values must match a plain VALID conv on the raw faces
        from jax import lax

        got = np.asarray(cs_conv(x, k31, k31, backend="xla"))
        ref = np.asarray(
            lax.conv_general_dilated(
                jnp.asarray(np.asarray(x)[0]), k31, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        np.testing.assert_allclose(
            got[0, :4, 1:-1, :], ref[:4], rtol=1e-5, atol=1e-5
        )


class TestLosses:
    def test_weighted_mse_constant_weights_is_mse(self):
        p, t = _rand((2, 6, 4, 4, 3), 16), _rand((2, 6, 4, 4, 3), 17)
        w = np.ones((6, 4, 4))
        np.testing.assert_allclose(
            float(weighted_mse(p, t, w)), float(mse(p, t)), rtol=1e-6
        )

    def test_area_weighted_mse(self):
        cs = CubedSphere(4)
        p, t = _rand((2, 6, 4, 4, 3), 18), _rand((2, 6, 4, 4, 3), 19)
        v = float(weighted_mse(p, t, cs.area_weights))
        assert np.isfinite(v) and v > 0

    def test_latitude_weighted_loss(self):
        lats = np.linspace(-87.5, 87.5, 8)
        loss = latitude_weighted_loss("mse", lats)
        p, t = _rand((2, 8, 16, 1), 20), _rand((2, 8, 16, 1), 21)
        assert float(loss(p, t)) > 0
        with pytest.raises(ValueError):
            latitude_weighted_loss("huber", lats)

    def test_acc_perfect_forecast(self):
        t = _rand((2, 6, 4, 4, 1), 22)
        climo = jnp.zeros_like(t)
        acc = np.asarray(anomaly_correlation(t, t, climo))
        np.testing.assert_allclose(acc, 1.0, rtol=1e-5)


def test_pallas_unprofitable_gate():
    """Auto-dispatch heuristic (r4), retired to legacy status in r5: under
    the default "split" backward the fused kernel wins EVERYWHERE measured
    (tools/r5_dispatch_ab.py — PERF.md round 5), so the heuristic must be
    inert; under the legacy "xla" composition backward it still routes
    pack=1 contracting TRAINING-batch shapes (decoder concat convs) to the
    dual-base ring-fix, but never serving batches (the b=1 rollout lost
    45 % to it — PERF.md round 5)."""
    import jax.numpy as jnp

    from dlwp_cs_tpu.ops.conv import _pallas_unprofitable
    from dlwp_cs_tpu.ops.pallas_conv import use_pallas_backward

    def flag(b, n, cin, cout):
        x = jnp.zeros((b, 6, n, n, cin), jnp.bfloat16)
        k = jnp.zeros((3, 3, cin, cout), jnp.bfloat16)
        return _pallas_unprofitable(x, k)

    # default ("split") backward: kernel everywhere
    assert not flag(16, 48, 96, 32)
    assert not flag(16, 24, 192, 64)
    with use_pallas_backward("xla"):
        assert flag(16, 48, 96, 32)      # decoder 96->32: ring-fix
        assert flag(16, 24, 192, 64)     # decoder 192->64: ring-fix
        assert not flag(1, 48, 96, 32)   # serving batch: keep the kernel
        assert not flag(16, 48, 32, 32)  # packable outer level: pallas
        assert not flag(16, 24, 64, 64)  # packable mid level: pallas
        assert not flag(16, 12, 128, 128)  # square bottleneck: pallas
        assert not flag(4, 48, 28, 128)  # model-packed expanding: pallas
