"""Row-blocked fused Pallas conv (ops/pallas_conv.py::cs_conv3x3_pallas_blocked):
the beyond-VMEM-shape path (VERDICT r4 next #3), equivalence-pinned in
interpret mode against the XLA ring-fix conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.ops import cs_conv
from dlwp_cs_tpu.ops.pallas_conv import (
    blocked_plan,
    blocked_row_count,
    cs_conv3x3_pallas_blocked,
)

N = 16


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


@pytest.mark.parametrize("nblk", [2, 4])
def test_blocked_matches_xla(nblk):
    h = N // nblk
    x = _rand((2, 6, N, N, 3), seed=11)
    k_eq = _rand((3, 3, 3, 5), seed=12) * 0.2
    k_po = _rand((3, 3, 3, 5), seed=13) * 0.2
    b_eq = _rand((5,), seed=14)
    b_po = _rand((5,), seed=15)
    ref = np.asarray(
        cs_conv(x, k_eq, k_po, bias_eq=b_eq, bias_pole=b_po, backend="xla")
    )
    got = np.asarray(
        cs_conv3x3_pallas_blocked(x, k_eq, k_po, b_eq, b_po, h, 1, True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("pack", [2, 4])
def test_blocked_packed_matches_xla(pack):
    """Batch->lane packing inside the blocked kernel (the hires-C96
    outer-level plan: blocking re-opens packing past the full-face
    budget)."""
    h = N // 2
    x = _rand((8, 6, N, N, 4), seed=16)
    k_eq = _rand((3, 3, 4, 4), seed=17) * 0.2
    k_po = _rand((3, 3, 4, 4), seed=18) * 0.2
    zb = jnp.zeros((4,), jnp.float32)
    ref = np.asarray(cs_conv(x, k_eq, k_po, backend="xla"))
    got = np.asarray(
        cs_conv3x3_pallas_blocked(x, k_eq, k_po, zb, zb, h, pack, True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_blocked_grads_match_xla():
    h = N // 4
    x = _rand((1, 6, N, N, 2), seed=21)
    k_eq = _rand((3, 3, 2, 3), seed=22) * 0.2
    k_po = _rand((3, 3, 2, 3), seed=23) * 0.2
    b_eq = _rand((3,), seed=24)
    b_po = _rand((3,), seed=25)

    def ref_loss(x, ke, kp, be, bp):
        return jnp.mean(
            cs_conv(x, ke, kp, bias_eq=be, bias_pole=bp, backend="xla") ** 2
        )

    def blk_loss(x, ke, kp, be, bp):
        return jnp.mean(
            cs_conv3x3_pallas_blocked(x, ke, kp, be, bp, h, 1, True) ** 2
        )

    gref = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(
        x, k_eq, k_po, b_eq, b_po
    )
    gblk = jax.grad(blk_loss, argnums=(0, 1, 2, 3, 4))(
        x, k_eq, k_po, b_eq, b_po
    )
    for a, b in zip(gblk, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_blocked_row_count_gate():
    ks, bf16 = (3, 3), jnp.bfloat16
    # flagship C48 shapes fit the full-face kernel: no blocking suggested
    # (the gate is only consulted after pallas_supported fails, but the
    # helper itself should still find a block for big shapes only)
    assert blocked_row_count((8, 6, 96, 96, 256), ks, 1, 1, bf16, 256) in (
        48, 24, 12,
    )
    # measured-OOM capacity shape: n=96 cin=12 cout=64 (PERF.md r4)
    assert blocked_row_count((8, 6, 96, 96, 12), ks, 1, 1, bf16, 64) is not None
    # non-3x3 / tiny n rejected
    assert blocked_row_count((8, 6, 96, 96, 64), (5, 5), 1, 1, bf16, 64) is None
    assert blocked_row_count((8, 6, 8, 8, 64), ks, 1, 1, bf16, 64) is None


def test_auto_dispatch_falls_through_to_blocked(monkeypatch):
    """When the full-face gate rejects a shape, auto dispatch must use the
    blocked kernel (not silently drop to ring-fix) when a block fits."""
    from dlwp_cs_tpu.ops import conv as conv_mod
    from dlwp_cs_tpu.ops import pallas_conv as pc

    calls = {}
    real = pc.cs_conv3x3_pallas_blocked

    def spy(x, ke, kp, be, bp, h, pack=1, interpret=False):
        calls["h"] = h
        calls["pack"] = pack
        return real(x, ke, kp, be, bp, h, pack, True)  # interpret on CPU

    monkeypatch.setattr(pc, "pallas_supported", lambda *a, **k: False)
    monkeypatch.setattr(
        pc, "blocked_plan", lambda *a, **k: (1, N // 2)
    )
    monkeypatch.setattr(pc, "cs_conv3x3_pallas_blocked", spy)
    monkeypatch.setattr(conv_mod, "_on_tpu", lambda: True)
    x = _rand((2, 6, N, N, 3), seed=31)
    k_eq = _rand((3, 3, 3, 5), seed=32) * 0.2
    k_po = _rand((3, 3, 3, 5), seed=33) * 0.2
    ref = np.asarray(cs_conv(x, k_eq, k_po, backend="xla"))
    got = np.asarray(cs_conv(x, k_eq, k_po, backend="auto"))
    assert calls["h"] == N // 2
    np.testing.assert_allclose(got, ref, atol=2e-5)
