"""Dissect the int8 serving regression (tools/serve_bench.py round 4).

Per-conv int8 micro (tools/int8_micro.py) says 1.5-1.9x, yet the FULL int8
rollout measured 2-3x SLOWER than the bf16 auto path.  This times the
shipped ``cs_conv3x3_int8`` against the production formulations and its own
pieces (differenced chains — tools/_timing.py) to locate the loss:
quantize/dequant elementwise passes, the global-amax reduce, in-graph weight
quantization, or the UNPACKED bf16 ring term (the production bf16 path runs
it packed / inside the Pallas kernel).

Usage: python tools/int8_dissect.py
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools._timing import diff_chain_time_us as _diff  # noqa: E402


def diff_chain_time_us(fn):
    # shorter chains than the default: 14 rows x 2 chain-lengths of remote
    # compiles at the default 1000/5000 blew a 20-minute budget
    return _diff(fn, chain_short=200, chain_long=1000, repeats=5)

from dlwp_cs_tpu.ops import packing  # noqa: E402
from dlwp_cs_tpu.ops.conv import cs_conv  # noqa: E402
from dlwp_cs_tpu.ops.quant import (  # noqa: E402
    cs_conv3x3_int8,
    quantize_kernel,
    quantize_tensor,
)
from dlwp_cs_tpu.ops.ringfix import face_select, ring_term  # noqa: E402
from dlwp_cs_tpu.ops.quant import _same_conv_int8  # noqa: E402


def main() -> int:
    rng = np.random.default_rng(0)
    shapes = [
        ("n=48 32->32", 16, 48, 32, 32),
        ("n=48 96->32", 16, 48, 96, 32),
    ]
    for label, b, n, cin, cout in shapes:
        x = jnp.asarray(
            rng.normal(size=(b, 6, n, n, cin)), jnp.bfloat16
        )
        ke = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.bfloat16)
        kp = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.bfloat16)
        qke, ske = quantize_kernel(ke)
        qkp, skp = quantize_kernel(kp)

        def carry_x(c):
            return x + c.astype(x.dtype)

        print(f"--- {label} (b={b}) ---", flush=True)

        def row(name, fn):
            print(f"  {name:30s} {diff_chain_time_us(fn):9.1f} us", flush=True)

        row("auto (production bf16)", lambda c: cs_conv(carry_x(c), ke, kp))
        row("int8 shipped", lambda c: cs_conv3x3_int8(carry_x(c), ke, kp))
        row("quantize_tensor alone",
            lambda c: quantize_tensor(carry_x(c))[0].astype(jnp.float32)
            * quantize_tensor(carry_x(c))[1])

        def int8_base_inline_wq(c):
            xc = carry_x(c)
            qx, sx = quantize_tensor(xc)
            e, se = quantize_kernel(ke)
            p_, sp_ = quantize_kernel(kp)
            eq = _same_conv_int8(qx, e).astype(jnp.float32) * (sx * se)
            po = _same_conv_int8(qx, p_).astype(jnp.float32) * (sx * sp_)
            return face_select(eq, po).astype(xc.dtype)

        row("int8 base (in-graph wq)", int8_base_inline_wq)

        def int8_base_preq(c):
            xc = carry_x(c)
            qx, sx = quantize_tensor(xc)
            eq = _same_conv_int8(qx, qke).astype(jnp.float32) * (sx * ske)
            po = _same_conv_int8(qx, qkp).astype(jnp.float32) * (sx * skp)
            return face_select(eq, po).astype(xc.dtype)

        row("int8 base (pre-q weights)", int8_base_preq)
        row("ring_term bf16 unpacked",
            lambda c: ring_term(carry_x(c), ke, kp))

        from dlwp_cs_tpu.ops.pallas_conv import _pack_factor

        p = _pack_factor(b, n, cin, cout, 2)
        if p > 1:
            def ring_packed(c):
                xp = packing.pack_batch(carry_x(c), p)
                return packing.unpack_batch(ring_term(xp, ke, kp, pack=p), p)

            row(f"ring_term bf16 packed p={p}", ring_packed)
    return 0


if __name__ == "__main__":
    main()
