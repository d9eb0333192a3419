"""Backward decomposition micro-bench: where does the conv VJP spend time?

The round-3 ablation (tools/ablate_step.py) puts the flagship step at
~8.7 ms with 6.35 ms in backward+optimizer, of which ~4.9 ms is the
halo-free base-conv VJP — the floor VERDICT r2 #1/#3 targets.  This tool
times, per U-Net level shape, the pieces of that VJP:

  fwd          packed SAME conv (the halo-free forward bound)
  vjp(full)    full pullback (dx + dw + db)
  vjp(dx)      input-cotangent only
  vjp(dw)      weight-cotangent only
in both the production packed layout and the unpacked one.

Run ON TPU: ``python tools/bwd_micro.py``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.ops import packing
from dlwp_cs_tpu.ops.ringfix import _same_conv

# Timing methodology: the remote tunnel's per-dispatch latency JITTERS by
# +-several ms, which swamps chains of 20-60 us ops (CHAIN=600 produced
# rows ABOVE the chip's bf16 peak).  Each op is therefore timed at TWO
# chain lengths and differenced — (T(long) - T(short)) / (long - short)
# cancels every per-dispatch constant exactly; medians over REPEATS tame
# the residual jitter.
B, CHAIN_SHORT, CHAIN_LONG, REPEATS = 16, 1000, 5000, 7

# (n, cin, cout) per U-Net level (encoder squares + decoder concat convs)
SHAPES = [
    (48, 32, 32),
    (24, 64, 64),
    (12, 128, 128),
    (24, 192, 64),
    (48, 96, 32),
]


def _wall(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> int:
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform}")

    def timed(fn, *args):
        # Anti-DCE methodology: (a) every input AND cotangent depends on the
        # scan carry, so nothing hoists out of the chain; (b) the reduction
        # is mean-of-SQUARES — a linear reduction of a linear op (e.g.
        # sum(conv(x))) is algebraically collapsible by XLA and produced
        # 0-us rows in the first run of this tool.
        def sq(t):
            return jnp.mean(jnp.square(t.astype(jnp.float32)))

        def body(c, _):
            out = fn(c, *args)
            leaves = jax.tree.leaves(out)
            return sum(sq(t) for t in leaves) * 1e-6, None

        def chain_of(length):
            run = jax.jit(
                lambda a0: lax.scan(body, jnp.zeros((), jnp.float32), None,
                                    length=length)[0]
            )
            float(run(jnp.zeros(())))  # compile + warm
            times = []
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                float(run(jnp.zeros(())))
                times.append(time.perf_counter() - t0)
            return float(np.median(times))

        t_short = chain_of(CHAIN_SHORT)
        t_long = chain_of(CHAIN_LONG)
        return max(
            (t_long - t_short) / (CHAIN_LONG - CHAIN_SHORT), 1e-9
        ) * 1e6  # us

    for n, cin, cout in SHAPES:
        x = jnp.asarray(
            rng.normal(size=(B, 6, n, n, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ke = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
        ).astype(jnp.bfloat16) * 0.05
        g = jnp.asarray(
            rng.normal(size=(B, 6, n, n, cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        p = packing.pack_factor(B, cin, cout)

        def conv_unpacked(xx, kk):
            return _same_conv(xx, kk)

        def conv_packed(xx, kk):
            if p == 1:
                return _same_conv(xx, kk)
            xp = packing.pack_batch(xx, p)
            out = _same_conv(xp, packing.block_diag_taps(kk, p))
            return packing.unpack_batch(out, p)

        rows = {}
        for tag, conv in (("unpacked", conv_unpacked), ("packed", conv_packed)):
            def xc(c):
                return x + c.astype(x.dtype)

            def gc(c):
                return g + c.astype(g.dtype)

            rows[f"{tag}/fwd"] = timed(lambda c: conv(xc(c), ke))
            rows[f"{tag}/vjp_full"] = timed(
                lambda c: jax.vjp(conv, xc(c), ke)[1](gc(c))
            )
            rows[f"{tag}/vjp_dx"] = timed(
                lambda c: jax.vjp(lambda v: conv(v, ke), xc(c))[1](gc(c))[0]
            )
            rows[f"{tag}/vjp_dw"] = timed(
                lambda c: jax.vjp(lambda kk: conv(xc(c), kk), ke)[1](gc(c))[0]
            )
        useful = 2 * B * 6 * n * n * 9 * cin * cout
        print(f"-- n={n} cin={cin} cout={cout} pack={p} "
              f"(useful fwd GFLOP={useful / 1e9:.2f})")
        for k, v in rows.items():
            # FLOP multiples of one forward conv: dx and dw are each one
            # conv-sized contraction; the full pullback is both.
            mult = {"fwd": 1, "vjp_full": 2, "vjp_dx": 1, "vjp_dw": 1}[
                k.split("/")[1]
            ]
            tf = useful * mult / (v * 1e-6) / 1e12
            print(f"  {k:18s} {v:8.1f} us   {tf:6.1f} TF/s useful")
    return 0


if __name__ == "__main__":
    sys.exit(main())
