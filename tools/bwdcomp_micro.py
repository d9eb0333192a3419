"""Ring-fix composition VJP under base-mode x packing variants.

The training backward runs through the ring-fix composition VJP; its base
structure (split faces + concat vs dual full-face convs + select,
tools/groupconv_micro.py) and layout (packed vs unpacked) are trace-time
choices.  This tool times the FULL vjp (x, k_eq, k_pole) — the thing the
train step actually pays — for each combination, plus the forward.
Differenced chains (tools/_timing.py).  Run ON TPU.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from _timing import diff_chain_time_us
from dlwp_cs_tpu.ops.ringfix import (
    cs_conv3x3_ringfix,
    use_base_mode,
    use_packed_base,
)

B = 16
SHAPES = [(48, 32, 32), (48, 96, 32), (24, 64, 64)]


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
        g = jnp.asarray(
            rng.normal(size=(B, 6, n, n, cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        print(f"-- n={n} cin={cin} cout={cout}", flush=True)

        def xc(c):
            return x + c.astype(x.dtype)

        def gc(c):
            return g + c.astype(g.dtype)

        for base in ("split", "dual"):
            for packed in (False, True):
                def rf(v, a, b2, base=base, packed=packed):
                    with use_base_mode(base), use_packed_base(packed):
                        return cs_conv3x3_ringfix(v, a, b2)

                tag = f"{base}/{'packed' if packed else 'unpacked'}"
                tf = diff_chain_time_us(lambda c, f=rf: f(xc(c), ke, kp))
                tv = diff_chain_time_us(
                    lambda c, f=rf: jax.vjp(f, xc(c), ke, kp)[1](gc(c))
                )
                print(f"  {tag:16s} fwd {tf:7.1f} us   vjp_full {tv:7.1f} us",
                      flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
