"""Shared TPU micro-timing: differenced chained-scan methodology.

The remote tunnel's per-dispatch latency jitters by +-several ms, which
swamps naive (wall - overhead) timings of chains of 20-200 us ops — the
first runs of tools/bwd_micro.py produced rows ABOVE the chip's bf16 peak
from pure dispatch noise.  Methodology here:

* the op runs inside a ``lax.scan`` whose carry feeds every input AND
  cotangent (nothing hoists), reduced with mean-of-SQUARES (a linear
  reduction of a linear op is algebraically collapsible by XLA);
* each op is timed at TWO chain lengths and differenced —
  ``(T(long) - T(short)) / (long - short)`` cancels every per-dispatch
  constant exactly; medians over repeats tame residual jitter.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

CHAIN_SHORT, CHAIN_LONG, REPEATS = 1000, 5000, 7


def diff_chain_time_us(fn, *args, chain_short: int = None,
                       chain_long: int = None, repeats: int = None) -> float:
    """Median per-op microseconds of ``fn(carry, *args)`` via differenced
    chains.  ``fn`` must return an array pytree whose values depend on the
    scalar f32 carry."""
    cs = chain_short or CHAIN_SHORT
    cl = chain_long or CHAIN_LONG
    reps = repeats or REPEATS

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
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(jnp.zeros(())))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t_short = chain_of(cs)
    t_long = chain_of(cl)
    return max((t_long - t_short) / (cl - cs), 1e-9) * 1e6
