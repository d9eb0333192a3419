"""Fused Pallas conv kernel vs XLA reference — equivalence fwd+bwd
(SURVEY.md §4.3), run in interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.ops import cs_conv
from dlwp_cs_tpu.ops.pallas_conv import (
    cs_conv3x3_pallas,
    pallas_supported,
    use_pallas_backward,
    vmem_estimate_bytes,
)


def test_unknown_backward_mode_rejected():
    with pytest.raises(ValueError, match="unknown pallas backward mode"):
        with use_pallas_backward("bogus"):
            pass
    x = _rand((1, 6, 8, 8, 3))
    k = _rand((3, 3, 3, 4)) * 0.2
    b = _rand((4,))
    with pytest.raises(ValueError, match="unknown pallas backward mode"):
        jax.grad(
            lambda v: jnp.sum(
                cs_conv3x3_pallas(v, k, k, b, b, True, "pack_dw") ** 2
            )
        )(x)


def _rand(shape, seed=0, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(dtype))


class TestSupportGate:
    def test_supported_configs(self):
        assert pallas_supported((2, 6, 48, 48, 64), (3, 3), 1, 1, jnp.float32)
        assert not pallas_supported((2, 6, 48, 48, 64), (5, 5), 1, 1, jnp.float32)
        assert not pallas_supported((2, 6, 48, 48, 64), (3, 3), 2, 1, jnp.float32)
        assert not pallas_supported((2, 6, 48, 48, 64), (3, 3), 1, 2, jnp.float32)
        # enormous channel count exceeds VMEM gate
        assert not pallas_supported((2, 6, 48, 48, 2048), (3, 3), 1, 1, jnp.float32)

    def test_large_n_cout_stack_gate(self):
        # regression (capacity_bench round 4): n=96, cin=12, cout=64
        # compiled to a 16.12 MB scoped-VMEM stack against the 16 MB limit
        # — the gate must consider the REAL cout, not assume cout == cin
        bad = dict(kernel_size=(3, 3), stride=1, dilation=1)
        assert not pallas_supported(
            (8, 6, 96, 96, 12), dtype=jnp.bfloat16, cout=64, **bad
        )
        # the same cin with a small cout (and the whole measured-good C96
        # flagship set) stays enabled
        assert pallas_supported(
            (8, 6, 96, 96, 12), dtype=jnp.bfloat16, cout=32, **bad
        )
        assert pallas_supported(
            (16, 6, 48, 48, 32), dtype=jnp.bfloat16, cout=32, **bad
        )
        assert pallas_supported(
            (16, 6, 48, 48, 96), dtype=jnp.bfloat16, cout=32, **bad
        )

    def test_vmem_estimate_monotonic(self):
        assert vmem_estimate_bytes(48, 128, 128) > vmem_estimate_bytes(48, 64, 64)


class TestForwardEquivalence:
    @pytest.mark.parametrize("n,cin,cout", [(8, 4, 5), (16, 3, 8)])
    def test_matches_xla(self, n, cin, cout):
        x = _rand((2, 6, n, n, cin), seed=1)
        k_eq = _rand((3, 3, cin, cout), seed=2) * 0.2
        k_po = _rand((3, 3, cin, cout), seed=3) * 0.2
        b_eq = _rand((cout,), seed=4)
        b_po = _rand((cout,), seed=5)
        ref = cs_conv(
            x, k_eq, k_po, bias_eq=b_eq, bias_pole=b_po, backend="xla"
        )
        out = cs_conv3x3_pallas(x, k_eq, k_po, b_eq, b_po, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_dispatcher_interpret_backend(self):
        x = _rand((1, 6, 8, 8, 3), seed=6)
        k = _rand((3, 3, 3, 4), seed=7) * 0.2
        ref = cs_conv(x, k, k, backend="xla")
        out = cs_conv(x, k, k, backend="pallas_interpret")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_dispatcher_falls_through_for_non3x3(self):
        # non-3x3 layers (e.g. 5x5, or the 1x1 head) take the generic XLA
        # path so a whole model can run with backend='pallas'
        x = _rand((1, 6, 8, 8, 3))
        k5 = _rand((5, 5, 3, 4)) * 0.1
        out = cs_conv(x, k5, k5, backend="pallas_interpret")
        ref = cs_conv(x, k5, k5, backend="xla")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestBackwardEquivalence:
    @pytest.mark.parametrize("fused", [False, True, "hybrid", "packdw", "split"])
    @pytest.mark.parametrize("n,cin,cout", [(8, 3, 4), (16, 5, 3)])
    def test_grads_match_xla_shapes(self, n, cin, cout, fused):
        x = _rand((2, 6, n, n, cin), seed=18)
        k_eq = _rand((3, 3, cin, cout), seed=19) * 0.2
        k_po = _rand((3, 3, cin, cout), seed=20) * 0.2
        b_eq = _rand((cout,), seed=21)
        b_po = _rand((cout,), seed=22)
        g = _rand((2, 6, n, n, cout), seed=23)

        def run(f):
            def loss(x, ke, kp, be, bp):
                return jnp.sum(f(x, ke, kp, be, bp) * g)

            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                x, k_eq, k_po, b_eq, b_po
            )

        gp = run(lambda *a: cs_conv3x3_pallas(*a, True, fused))
        gx = run(
            lambda x, ke, kp, be, bp: cs_conv(
                x, ke, kp, bias_eq=be, bias_pole=bp, backend="xla"
            )
        )
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    def test_grads_match_xla(self):
        n, cin, cout = 8, 3, 4
        x = _rand((2, 6, n, n, cin), seed=8)
        k_eq = _rand((3, 3, cin, cout), seed=9) * 0.2
        k_po = _rand((3, 3, cin, cout), seed=10) * 0.2
        b_eq = _rand((cout,), seed=11)
        b_po = _rand((cout,), seed=12)

        def loss_pallas(x, ke, kp, be, bp):
            return jnp.sum(cs_conv3x3_pallas(x, ke, kp, be, bp, True) ** 2)

        def loss_xla(x, ke, kp, be, bp):
            return jnp.sum(
                cs_conv(x, ke, kp, bias_eq=be, bias_pole=bp, backend="xla") ** 2
            )

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, k_eq, k_po, b_eq, b_po)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, k_eq, k_po, b_eq, b_po)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )
