"""Ring-fix conv: exact equivalence with the pad-then-conv reference,
forward and gradients, f32 and bf16."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.ops import cs_conv
from dlwp_cs_tpu.ops.ringfix import cs_conv3x3_ringfix


def _rand(shape, seed=0, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(dtype))


@pytest.mark.parametrize("n,cin,cout,bias", [(8, 3, 5, True), (16, 4, 4, False), (12, 1, 7, True)])
def test_forward_matches_pad_path(n, cin, cout, bias):
    x = _rand((2, 6, n, n, cin), seed=1)
    k_eq = _rand((3, 3, cin, cout), seed=2) * 0.3
    k_po = _rand((3, 3, cin, cout), seed=3) * 0.3
    b_eq = _rand((cout,), seed=4) if bias else None
    b_po = _rand((cout,), seed=5) if bias else None
    ref = cs_conv(x, k_eq, k_po, bias_eq=b_eq, bias_pole=b_po, backend="xla")
    out = cs_conv3x3_ringfix(x, k_eq, k_po, bias_eq=b_eq, bias_pole=b_po)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_auto_backend_uses_ringfix_everywhere():
    # 'auto' now routes 3x3/s1 to ringfix on every platform; equality with
    # the xla pad path is the contract.
    x = _rand((1, 6, 8, 8, 2), seed=6)
    k = _rand((3, 3, 2, 3), seed=7) * 0.3
    ref = cs_conv(x, k, k, backend="xla")
    out = cs_conv(x, k, k)  # auto
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_grads_match_pad_path():
    n, cin, cout = 8, 3, 4
    x = _rand((2, 6, n, n, cin), seed=8)
    k_eq = _rand((3, 3, cin, cout), seed=9) * 0.3
    k_po = _rand((3, 3, cin, cout), seed=10) * 0.3

    def loss_ring(x, ke, kp):
        return jnp.sum(cs_conv3x3_ringfix(x, ke, kp) ** 2)

    def loss_xla(x, ke, kp):
        return jnp.sum(cs_conv(x, ke, kp, backend="xla") ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(x, k_eq, k_po)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k_eq, k_po)
    for a, b in zip(gr, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_bf16_runs_and_close():
    x = _rand((1, 6, 8, 8, 4), seed=11).astype(jnp.bfloat16)
    k = (_rand((3, 3, 4, 4), seed=12) * 0.3).astype(jnp.bfloat16)
    out = cs_conv3x3_ringfix(x, k, k)
    ref = cs_conv(x, k, k, backend="xla")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        rtol=0.1,
        atol=0.1,
    )


def test_constant_field_exact():
    x = jnp.full((1, 6, 8, 8, 2), 1.5)
    k = _rand((3, 3, 2, 3), seed=13)
    out = np.asarray(cs_conv3x3_ringfix(x, k, k))
    expect = 1.5 * np.asarray(k).sum(axis=(0, 1, 2))
    np.testing.assert_allclose(out, np.broadcast_to(expect, out.shape), rtol=1e-4)


def test_non3x3_falls_through():
    # non-3x3 layers (e.g. a 5x5, or the 1x1 output head) take the generic
    # XLA path under backend="ringfix" so a whole model can pin ring-fix
    import numpy as np
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 6, 8, 8, 2)).astype(np.float32))
    k5 = jnp.asarray(rng.normal(size=(5, 5, 2, 3)).astype(np.float32)) * 0.1
    out = cs_conv(x, k5, k5, backend="ringfix")
    ref = cs_conv(x, k5, k5, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_packed_base_matches_unpacked():
    """use_packed_base: the batch->lane packed base convs are the exact
    same linear map (grads included)."""
    import jax

    from dlwp_cs_tpu.ops.ringfix import cs_conv3x3_ringfix, use_packed_base

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(4, 6, 8, 8, 3)).astype(np.float32))
    ke = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32) * 0.2)
    kp = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32) * 0.2)

    def loss(v, a, b):
        return jnp.sum(cs_conv3x3_ringfix(v, a, b) ** 2)

    ref = cs_conv3x3_ringfix(x, ke, kp)
    gref = jax.grad(loss, argnums=(0, 1, 2))(x, ke, kp)
    with use_packed_base():
        out = cs_conv3x3_ringfix(x, ke, kp)
        gout = jax.grad(loss, argnums=(0, 1, 2))(x, ke, kp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(gout, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
