"""Per-conv timing of the xring formulation (ops/ring_kernel.py) vs the
production paths, differenced-chain methodology (tools/_timing.py).

Rows per level shape: xring fwd, xring vjp with the hand-derived "split"
backward, and xring vjp with the "ringfix" composition backward — compare
against tools/halo_micro.py's pallas/ringfix rows and tools/bwd_micro.py's
halo-free bounds.  Run ON TPU: ``python tools/xring_micro.py``.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from _timing import diff_chain_time_us
from dlwp_cs_tpu.ops.ring_kernel import cs_conv3x3_xring

B = 16
# the shapes that decide the dispatch policy
SHAPES = [
    (48, 32, 32),
    (48, 96, 32),
    (24, 64, 64),
    (24, 192, 64),
]


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
        g = jnp.asarray(
            rng.normal(size=(B, 6, n, n, cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        useful = 2 * B * 6 * n * n * 9 * cin * cout
        print(f"-- n={n} cin={cin} cout={cout}", flush=True)

        def xc(c):
            return x + c.astype(x.dtype)

        def gc(c):
            return g + c.astype(g.dtype)

        def row(name, fn, mult=1.0):
            t = diff_chain_time_us(fn)
            tf = useful * mult / (t * 1e-6) / 1e12
            print(f"  {name:22s} {t:8.1f} us   {tf:6.1f} TF/s useful",
                  flush=True)

        row("xring/fwd",
            lambda c: cs_conv3x3_xring(xc(c), ke, kp, zb, zb))
        for mode in ("split", "ringfix"):
            row(
                f"xring/vjp {mode}",
                lambda c, m=mode: jax.vjp(
                    lambda v, a, b: cs_conv3x3_xring(v, a, b, zb, zb,
                                                     False, m),
                    xc(c), ke, kp,
                )[1](gc(c)),
                mult=2,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
