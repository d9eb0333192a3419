"""Batch->lane packing (ops/packing.py): exactness of the packed conv.

The packed form must be the EXACT same linear map (zeros in the
off-diagonal blocks), not an approximation — pinned here against the
unpacked XLA conv, plus round-trip and factor-selection properties.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.ops.packing import (
    block_diag_taps,
    pack_batch,
    pack_factor,
    unpack_batch,
)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


class TestPackRoundTrip:
    @pytest.mark.parametrize("p", [2, 4, 8])
    def test_unpack_inverts_pack(self, p):
        x = _rand((8, 6, 5, 7, 3), seed=1)
        np.testing.assert_array_equal(
            np.asarray(unpack_batch(pack_batch(x, p), p)), np.asarray(x)
        )

    def test_pack_is_p_major(self):
        # lane index = i*C + c for batch-slot i, channel c
        x = _rand((4, 6, 2, 2, 3), seed=2)
        y = pack_batch(x, 2)
        np.testing.assert_array_equal(
            np.asarray(y[0, 0, 0, 0, :3]), np.asarray(x[0, 0, 0, 0])
        )
        np.testing.assert_array_equal(
            np.asarray(y[0, 0, 0, 0, 3:]), np.asarray(x[1, 0, 0, 0])
        )


class TestPackFactor:
    def test_respects_cap_and_divisibility(self):
        assert pack_factor(16, 32, 32) == 4
        assert pack_factor(16, 64, 64) == 2
        assert pack_factor(16, 128, 128) == 1
        assert pack_factor(16, 96, 32) == 1  # 2*96 > 128
        assert pack_factor(3, 16, 16) == 1   # no divisor
        assert pack_factor(16, 8, 8) == 8
        assert pack_factor(16, 7, 32) == 4   # mixed cin/cout


class TestPackedConvExactness:
    @pytest.mark.parametrize("p,cin,cout", [(2, 5, 6), (4, 3, 8)])
    def test_packed_equals_unpacked(self, p, cin, cout):
        b, n = 8, 6
        x = _rand((b, 6, n, n, cin), seed=3)
        k = _rand((3, 3, cin, cout), seed=4) * 0.2

        def same_conv(v, kk):
            merged = v.reshape((-1,) + v.shape[2:])
            out = lax.conv_general_dilated(
                merged, kk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out.reshape(v.shape[:2] + out.shape[1:])

        ref = same_conv(x, k)
        got = unpack_batch(same_conv(pack_batch(x, p), block_diag_taps(k, p)), p)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
