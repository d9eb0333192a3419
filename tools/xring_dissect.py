"""Dissect the xring forward's cost: kernel alone, apply alone, pieces.

xring/fwd measured ~600 us at n=48/c=32 where its pieces were believed to
sum to ~230 (same conv 49 + ext 89 + ring kernel + apply).  This tool times
each piece in isolation with the differenced-chain methodology to find the
missing ~370 us.  Run ON TPU: ``python tools/xring_dissect.py``.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from _timing import diff_chain_time_us
from dlwp_cs_tpu.ops.halo import ext_strips
from dlwp_cs_tpu.ops.ring_kernel import (
    cs_conv3x3_xring,
    ring_apply,
    ring_fixes_pallas,
)
from dlwp_cs_tpu.ops.ringfix import _same_conv

B = 16
SHAPES = [(48, 32, 32), (48, 96, 32)]


def main() -> int:
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for n, cin, cout in SHAPES:
        x = jnp.asarray(
            rng.normal(size=(B, 6, n, n, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ke = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
        ).astype(jnp.bfloat16) * 0.05
        kp = ke * 0.9
        zb = jnp.zeros((cout,), x.dtype)
        ext0 = ext_strips(x)
        fixes0, cor0 = ring_fixes_pallas(ext0, ke, kp)
        base0 = jnp.zeros((B, 6, n, n, cout), x.dtype)
        print(f"-- n={n} cin={cin} cout={cout}", flush=True)

        def xc(c):
            return x + c.astype(x.dtype)

        def row(name, fn):
            t = diff_chain_time_us(fn)
            print(f"  {name:22s} {t:8.1f} us", flush=True)

        row("same-conv", lambda c: jnp.concatenate(
            [_same_conv(xc(c)[:, :4], ke), _same_conv(xc(c)[:, 4:], kp)],
            axis=1))
        row("ext", lambda c: ext_strips(xc(c)))
        row("ringkernel-only", lambda c: ring_fixes_pallas(
            ext0 + c.astype(x.dtype), ke, kp))
        row("apply-only", lambda c: ring_apply(
            base0 + c.astype(x.dtype), fixes0, cor0))
        row("ext+kernel", lambda c: ring_fixes_pallas(
            ext_strips(xc(c)), ke, kp))
        row("xring/fwd", lambda c: cs_conv3x3_xring(xc(c), ke, kp, zb, zb))
    return 0


if __name__ == "__main__":
    sys.exit(main())
