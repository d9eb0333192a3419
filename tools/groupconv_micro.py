"""How to run the eq/polar weight-GROUP conv without the 437-us face-split.

tools/xring_dissect.py found the two-group formulation (slice faces 0:4 /
4:6, conv each, concat on the face axis) costs 437 us at n=48/c=32 where a
single merged 6-face conv is 49 us — the split/concat structure, not the
convs, dominates every XLA path.  Variants timed here:

  split      x[:, :4] conv + x[:, 4:] conv + face concat (current)
  dual       TWO full 6-face convs (k_eq, k_pole) + masked face select
  fat        ONE 6-face conv with cout=2D stacked [k_eq | k_pole] + select
             from the two lane halves per face
  merged     one conv, k_eq only (the no-groups lower bound, wrong math)

Run ON TPU: ``python tools/groupconv_micro.py``.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from _timing import diff_chain_time_us
from dlwp_cs_tpu.ops.ringfix import _same_conv

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

        face = lax.broadcasted_iota(jnp.int32, (6, 1, 1, 1), 0)[None]

        def split(v):
            return jnp.concatenate(
                [_same_conv(v[:, :4], ke), _same_conv(v[:, 4:], kp)], axis=1
            )

        def dual(v):
            return jnp.where(face < 4, _same_conv(v, ke), _same_conv(v, kp))

        kfat = jnp.concatenate([ke, kp], axis=-1)  # (3, 3, Cin, 2D)

        def fat(v):
            both = _same_conv(v, kfat)  # (B, 6, n, n, 2D)
            return jnp.where(face < 4, both[..., :cout], both[..., cout:])

        def merged(v):
            return _same_conv(v, ke)

        variants = {"split": split, "dual": dual, "fat": fat,
                    "merged": merged}
        ref = np.asarray(split(x), np.float32)
        for name, fn in variants.items():
            err = float(np.max(np.abs(np.asarray(fn(x), np.float32) - ref)))
            t = diff_chain_time_us(lambda c, f=fn: f(xc(c)))
            tv = diff_chain_time_us(
                lambda c, f=fn: jax.vjp(f, xc(c))[1](gc(c))
            )
            print(f"  {name:8s} fwd {t:7.1f} us   vjp(x) {tv:7.1f} us"
                  f"   maxerr={err:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
