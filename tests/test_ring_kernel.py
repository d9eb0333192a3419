"""xring formulation (ops/ring_kernel.py): XLA SAME conv + Pallas ring
kernel must reproduce the reference pad-path conv exactly (fwd and grads),
including through the cs_conv dispatch and a full model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import CubeSphereUNet, UNetConfig
from dlwp_cs_tpu.ops import cs_conv
from dlwp_cs_tpu.ops.ring_kernel import (
    cs_conv3x3_xring,
    ring_apply,
    ring_fixes_pallas,
)

N = 16


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


@pytest.mark.parametrize("cin,cout", [(3, 5), (8, 8)])
def test_xring_matches_pad_path(cin, cout):
    x = _rand((2, 6, N, N, cin), seed=1)
    ke = _rand((3, 3, cin, cout), seed=2) * 0.2
    kp = _rand((3, 3, cin, cout), seed=3) * 0.2
    be = _rand((cout,), seed=4)
    bp = _rand((cout,), seed=5)
    ref = cs_conv(x, ke, kp, bias_eq=be, bias_pole=bp, backend="xla")
    got = cs_conv(x, ke, kp, bias_eq=be, bias_pole=bp,
                  backend="xring_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("backward", ["split", "ringfix"])
def test_xring_grads_match_pad_path(backward):
    x = _rand((1, 6, N, N, 2), seed=11)
    ke = _rand((3, 3, 2, 3), seed=12) * 0.2
    kp = _rand((3, 3, 2, 3), seed=13) * 0.2
    be = _rand((3,), seed=14)
    bp = _rand((3,), seed=15)

    def loss_ref(x, ke, kp, be, bp):
        return jnp.mean(
            cs_conv(x, ke, kp, bias_eq=be, bias_pole=bp, backend="xla") ** 2
        )

    def loss_x(x, ke, kp, be, bp):
        return jnp.mean(
            cs_conv3x3_xring(x, ke, kp, be, bp, True, backward) ** 2
        )

    gref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, ke, kp, be, bp)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(x, ke, kp, be, bp)
    for a, b in zip(gx, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_ring_fixes_match_ring_term():
    """The kernel's fixes/corners applied via ring_apply equal ring_term."""
    from dlwp_cs_tpu.ops.halo import ext_strips
    from dlwp_cs_tpu.ops.ringfix import ring_term

    x = _rand((2, 6, N, N, 4), seed=21)
    ke = _rand((3, 3, 4, 6), seed=22) * 0.2
    kp = _rand((3, 3, 4, 6), seed=23) * 0.2
    ref = np.asarray(ring_term(x, ke, kp))
    fixes, corners = ring_fixes_pallas(ext_strips(x), ke, kp, interpret=True)
    base = jnp.zeros((2, 6, N, N, 6), x.dtype)
    got = np.asarray(ring_apply(base, fixes, corners))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_model_with_xring_backend():
    cfg_ref = UNetConfig(output_channels=2, filters=(4, 8))
    cfg_x = UNetConfig(
        output_channels=2, filters=(4, 8), conv_backend="xring_interpret"
    )
    x = _rand((2, 6, N, N, 3), seed=31)
    model_ref = CubeSphereUNet(cfg_ref)
    params = model_ref.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model_ref.apply(params, x))
    got = np.asarray(CubeSphereUNet(cfg_x).apply(params, x))
    np.testing.assert_allclose(got, ref, atol=3e-5)
