"""Micro-timing of the U-Net's non-conv ops at flagship shapes.

After the conv packing work the fused forward is ~4.2 ms of which packed
convs are ~2.6 — this measures where the rest goes: pooling, upsampling,
skip concat, the 1x1 head, activations.  Chained-scan methodology.

Run ON TPU: ``python tools/glue_micro.py``.
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

from dlwp_cs_tpu.ops.pooling import cs_avg_pool, cs_upsample

CHAIN, REPEATS, B = 100, 5, 16


def _wall(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def time_chain(fn, x, t_over):
    @jax.jit
    def run(v):
        def body(c, _):
            out = fn(v + c.astype(v.dtype))
            return jnp.mean(out).astype(jnp.float32), None

        c, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=CHAIN)
        return c

    jax.block_until_ready(run(x))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return max((best - t_over) / CHAIN, 1e-9)


def main() -> int:
    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.zeros(())))
    t_over = min(_wall(lambda: float(trivial(jnp.zeros(())))) for _ in range(5))
    print(f"platform={jax.devices()[0].platform} overhead={t_over * 1e3:.1f}ms",
          flush=True)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def arr(n, c):
        return jnp.asarray(rng.normal(size=(B, 6, n, n, c)), dtype=dt)

    def pool_strided(v):
        # 4 strided slices + adds instead of the 6-D reshape-mean
        return 0.25 * (
            v[..., 0::2, 0::2, :]
            + v[..., 0::2, 1::2, :]
            + v[..., 1::2, 0::2, :]
            + v[..., 1::2, 1::2, :]
        )

    def pool_reduce(v):
        return lax.reduce_window(
            v, jnp.zeros((), v.dtype), lax.add,
            (1, 1, 2, 2, 1), (1, 1, 2, 2, 1), "VALID",
        ) * jnp.asarray(0.25, v.dtype)

    rows = {}
    rows["pool48x32"] = time_chain(lambda v: cs_avg_pool(v, 2), arr(48, 32), t_over)
    rows["poolS48x32"] = time_chain(pool_strided, arr(48, 32), t_over)
    rows["poolR48x32"] = time_chain(pool_reduce, arr(48, 32), t_over)
    rows["pool24x64"] = time_chain(lambda v: cs_avg_pool(v, 2), arr(24, 64), t_over)
    rows["poolS24x64"] = time_chain(pool_strided, arr(24, 64), t_over)
    rows["up24x64"] = time_chain(lambda v: cs_upsample(v, 2), arr(24, 64), t_over)
    rows["up12x128"] = time_chain(lambda v: cs_upsample(v, 2), arr(12, 128), t_over)
    skip = arr(48, 32)
    rows["concat48"] = time_chain(
        lambda v: jnp.concatenate([v, skip], axis=-1), arr(48, 64), t_over
    )
    rows["relu48x32"] = time_chain(
        lambda v: jax.nn.leaky_relu(v, 0.1), arr(48, 32), t_over
    )
    k1 = jnp.asarray(rng.normal(size=(1, 1, 32, 8)) * 0.1, dt)
    from dlwp_cs_tpu.ops import cs_conv

    rows["head1x1"] = time_chain(
        lambda v: cs_conv(v, k1, k1, backend="xla"), arr(48, 32), t_over
    )

    # ext-strips gather: unpacked (rows of 32 lanes) vs packed (rows of 128)
    from dlwp_cs_tpu.ops.halo import ext_strips
    from dlwp_cs_tpu.ops.packing import pack_batch

    rows["ext48x32"] = time_chain(lambda v: ext_strips(v), arr(48, 32), t_over)
    rows["extP48"] = time_chain(
        lambda v: ext_strips(pack_batch(v, 4)), arr(48, 32), t_over
    )
    xp4 = pack_batch(arr(48, 32), 4)
    rows["extPonly"] = time_chain(lambda v: ext_strips(v), xp4, t_over)
    for k, v in rows.items():
        print(f"{k:10s} {v * 1e6:7.1f} us", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
