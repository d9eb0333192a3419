"""Micro-ablation of the fused Pallas conv forward: where do the µs go?

Times (chained-scan methodology, PERF.md) at each U-Net level's shape:
  same       - XLA per-face SAME conv, no halo (wrong math; lower bound)
  ext        - ext_strips alone (the XLA gather pair feeding the kernel)
  kernel     - pallas_call alone on precomputed strips (VMEM assembly + dots)
  pallas     - full fused conv (ext_strips + kernel)
  ringfix    - the XLA ring-fix formulation (for reference)

Run ON TPU: ``python tools/conv_micro.py``.
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

from dlwp_cs_tpu.ops.halo import ext_strips
from dlwp_cs_tpu.ops.pallas_conv import _forward
from dlwp_cs_tpu.ops.ringfix import cs_conv3x3_ringfix, _same_conv

CHAIN, REPEATS = 50, 5
# (n, cin, cout, batch) per U-Net level at the bench config (C48, b=16)
LEVELS = [
    (48, 32, 32, 16),
    (24, 64, 64, 16),
    (12, 128, 128, 16),
]


def _wall(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def time_chain(fn, *args, t_over=0.0):
    """fn(*args) -> array; returns best per-iteration seconds of CHAIN calls."""

    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*(x + c.astype(x.dtype) if i == 0 else x
                       for i, x in enumerate(a)))
            return jnp.mean(out).astype(jnp.float32), None

        c, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=CHAIN)
        return c

    out = run(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return max((best - t_over) / CHAIN, 1e-9)


def main() -> int:
    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.zeros(())))
    t_over = min(_wall(lambda: float(trivial(jnp.zeros(())))) for _ in range(5))
    print(f"platform={jax.devices()[0].platform} overhead={t_over * 1e3:.1f}ms")

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    for n, cin, cout, b in LEVELS:
        x = jnp.asarray(rng.normal(size=(b, 6, n, n, cin)), dtype=dt)
        ke = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, dtype=dt)
        kp = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, dtype=dt)
        be = jnp.zeros((cout,), dt)
        bp = jnp.zeros((cout,), dt)
        ext = ext_strips(x)

        rows = {}
        rows["same"] = time_chain(
            lambda v: jnp.concatenate(
                [_same_conv(v[:, :4], ke), _same_conv(v[:, 4:], kp)], axis=1
            ),
            x, t_over=t_over,
        )
        rows["ext"] = time_chain(lambda v: ext_strips(v), x, t_over=t_over)
        rows["kernel"] = time_chain(
            lambda v, e: _kernel_only(v, e, ke, kp, be, bp),
            x, ext, t_over=t_over,
        )
        rows["pallas"] = time_chain(
            lambda v: _forward(v, ke, kp, be, bp, False), x, t_over=t_over
        )
        rows["ringfix"] = time_chain(
            lambda v: cs_conv3x3_ringfix(v, ke, kp, bias_eq=be, bias_pole=bp),
            x, t_over=t_over,
        )
        # backward decomposition: Pallas dx kernel vs the XLA composition's
        # dx-only and dw-only pullbacks (g fixed = x-shaped ones)
        from dlwp_cs_tpu.ops.pallas_conv import _dx_via_kernel

        # NOTE: dx is linear in the cotangent and independent of the primal
        # values, so the varying chain input v must BE the cotangent — a
        # fixed g would be loop-invariant and XLA would hoist the whole conv
        # out of the scan (cin == cout at every level here, so shapes work).
        assert cin == cout
        rows["dx_pl"] = time_chain(
            lambda v: _dx_via_kernel(v.shape, v.dtype, ke, kp, v, False),
            x, t_over=t_over,
        )

        def dx_xla(v):
            _, pull = jax.vjp(
                lambda u: cs_conv3x3_ringfix(u, ke, kp, bias_eq=be, bias_pole=bp),
                v,
            )
            return pull(v)[0]

        g = jnp.asarray(rng.normal(size=(b, 6, n, n, cout)), dtype=dt)

        def dw_xla(v):
            _, pull = jax.vjp(
                lambda a, c: cs_conv3x3_ringfix(v, a, c, bias_eq=be, bias_pole=bp),
                ke, kp,
            )
            return pull(g)[0]

        rows["dx_xla"] = time_chain(dx_xla, x, t_over=t_over)
        rows["dw_xla"] = time_chain(dw_xla, x, t_over=t_over)
        flops = 2 * b * 6 * n * n * 9 * cin * cout
        line = " ".join(f"{k}={v * 1e6:7.1f}us" for k, v in rows.items())
        tf = flops / rows["pallas"] / 1e12
        print(f"n={n:3d} c={cin:3d}: {line}  pallas={tf:5.1f}TF/s")
    return 0


def _kernel_only(x, ext, ke, kp, be, bp):
    """The pallas_call with ext supplied externally (no gather cost)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dlwp_cs_tpu.ops import pallas_conv as pc

    b, _, n, _, cin = x.shape
    cout = ke.shape[-1]
    kernel = functools.partial(pc._kernel, n=n)
    return pl.pallas_call(
        kernel,
        grid=(b, 6),
        in_specs=[
            pl.BlockSpec((1, 1, n, n, cin), lambda i, f: (i, f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, n + 2, cin), lambda i, f: (i, f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, n, cout), lambda i, f: (i, f, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 6, n, n, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2, cin), x.dtype)],
    )(x, ext, ke, kp, be.reshape(1, -1), bp.reshape(1, -1))


if __name__ == "__main__":
    sys.exit(main())
