"""Probe: int8 MXU throughput vs bf16 at DLWP shapes (v5e int8 peak = 2x bf16).

Question (round 4): is a quantized int8 serving path worth building?  The
v5e MXU advertises 394 TOPS int8 vs 197 TFLOP/s bf16.  This probe measures
whether XLA:TPU actually delivers that ratio (a) on large square matmuls
(the hardware ceiling), and (b) on the flagship U-Net's conv shapes, where
MXU underfill — not peak — dominates (PERF.md round-3 tables).

Methodology: tools/_timing.py differenced chains (dispatch noise cancels);
the carry feeds the KERNEL only, so the input tensor stays resident and the
conv cannot be hoisted.

Usage: python tools/int8_micro.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _timing import diff_chain_time_us  # noqa: E402

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv_time(bf, n, cin, cout, dtype, acc):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(-8, 8, size=(bf, n, n, cin)).astype(np.float32)
    ).astype(dtype)
    kf = jnp.asarray(
        rng.integers(-8, 8, size=(3, 3, cin, cout)).astype(np.float32)
    )

    def op(c, x, kf):
        k = (kf + c).astype(dtype)
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=_DIMSPEC,
            preferred_element_type=acc,
        )

    return diff_chain_time_us(op, x, kf)


def matmul_time(m, k_, n_, dtype, acc):
    rng = np.random.default_rng(0)
    a = jnp.asarray(
        rng.integers(-8, 8, size=(m, k_)).astype(np.float32)
    ).astype(dtype)
    bf = jnp.asarray(rng.integers(-8, 8, size=(k_, n_)).astype(np.float32))

    def op(c, a, bf):
        b = (bf + c).astype(dtype)
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
        )

    return diff_chain_time_us(op, a, bf)


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform} kind={getattr(dev, 'device_kind', '?')}")

    # (a) hardware ceiling: big square matmul
    for m in (1024, 2048):
        t_bf = matmul_time(m, m, m, jnp.bfloat16, jnp.float32)
        flops = 2.0 * m * m * m
        try:
            t_i8 = matmul_time(m, m, m, jnp.int8, jnp.int32)
        except Exception as e:  # noqa: BLE001
            print(f"matmul {m}^3: int8 FAILED: {type(e).__name__}: {e}")
            t_i8 = float("nan")
        print(
            f"matmul {m}^3: bf16 {t_bf:8.1f} us ({flops / t_bf / 1e6:6.1f} TF/s)"
            f"  int8 {t_i8:8.1f} us ({flops / t_i8 / 1e6:6.1f} TOP/s)"
            f"  ratio {t_bf / t_i8:.2f}x"
        )

    # (b) flagship conv shapes (b=16 folded with 6 faces -> 96)
    shapes = [(96, 48, 32, 32), (96, 24, 64, 64), (96, 12, 128, 128),
              (96, 48, 96, 32), (96, 24, 192, 64),
              # rollout/serving shapes: b=1 -> 6 faces only
              (6, 48, 32, 32), (6, 24, 64, 64), (6, 12, 128, 128)]
    for bf, n, cin, cout in shapes:
        t_bf = conv_time(bf, n, cin, cout, jnp.bfloat16, jnp.float32)
        flops = 2.0 * bf * n * n * 9 * cin * cout
        try:
            t_i8 = conv_time(bf, n, cin, cout, jnp.int8, jnp.int32)
            ratio = f"{t_bf / t_i8:.2f}x"
            i8s = f"{t_i8:8.1f} us ({flops / t_i8 / 1e6:6.1f} TOP/s)"
        except Exception as e:  # noqa: BLE001
            i8s, ratio = f"FAILED: {type(e).__name__}", "-"
        print(
            f"conv b={bf:3d} n={n:2d} {cin:3d}->{cout:3d}: "
            f"bf16 {t_bf:8.1f} us ({flops / t_bf / 1e6:6.1f} TF/s)  int8 {i8s}"
            f"  ratio {ratio}"
        )


if __name__ == "__main__":
    main()
