"""Profiling helpers: jax profiler traces + simple roofline accounting.

SURVEY.md §5.1: the reference has no tracing/profiling beyond Keras progress
bars; this module provides the TPU-native story — Perfetto-compatible traces
around training/rollout steps and a per-op roofline estimate for the conv
stencils (the BASELINE grid-points/s accounting).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from pathlib import Path

import jax

__all__ = ["trace", "Timer", "conv_roofline"]


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax profiler trace into ``logdir`` (view with Perfetto).

    Usage::

        with trace("/tmp/profile"):
            state, _ = train_step(state, x, y)
            jax.block_until_ready(state.params)
    """
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Timer:
    """Plain wall-clock timer — does NOT synchronize the device.

    JAX dispatch is async: wrap the timed region's outputs in
    ``jax.block_until_ready`` yourself, or use :meth:`time_fn`, which
    synchronizes explicitly."""

    elapsed: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False

    @staticmethod
    def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
        """Mean seconds per call, fully synchronized."""
        out = None
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters


def conv_roofline(
    *,
    batch: int,
    n: int,
    cin: int,
    cout: int,
    kernel: int = 3,
    dtype_bytes: int = 4,
    peak_flops: float = 197e12,  # TPU v5e bf16 peak (394e12 is the int8 figure)
    hbm_bw: float = 8.1e11,  # TPU v5e HBM bytes/s
) -> dict:
    """Roofline estimate for one cubed-sphere conv (fwd).

    Returns flops, bytes, arithmetic intensity, and the compute/bandwidth
    bound times — the yardstick for judging kernel efficiency against
    measured step times (speed-of-light accounting).
    """
    cells = batch * 6 * n * n
    flops = 2.0 * cells * kernel * kernel * cin * cout
    bytes_accessed = (
        cells * cin * dtype_bytes  # read activations
        + cells * cout * dtype_bytes  # write result
        + 2 * kernel * kernel * cin * cout * dtype_bytes  # weights
    )
    t_compute = flops / peak_flops
    t_memory = bytes_accessed / hbm_bw
    return {
        "flops": flops,
        "bytes": bytes_accessed,
        "intensity": flops / bytes_accessed,
        "t_compute_s": t_compute,
        "t_memory_s": t_memory,
        "bound": "compute" if t_compute > t_memory else "memory",
        "t_light_s": max(t_compute, t_memory),
    }
