"""Round-5 in-session A/B: conv dispatch + backward-mode variants.

The round-5 pinned worktree A/B (PERF.md round 5) localized the r2->r4
scoreboard drift to two code-level changes:

* r3-final runs the fused kernel on EVERY 3x3 (incl. the decoder concat
  convs) and lost 1.75 ms/step vs r2-final in the same session;
* r4's ``_pallas_unprofitable`` routed those decoder convs to the
  dual-base ring-fix, recovering to ~0.5 ms of r2-final.

This tool measures, in ONE session, the remaining candidates for that
last half millisecond: the production dispatch vs kernel-everywhere under
each selectable Pallas backward ("xla" composition, "split" hand VJP).
Chained-scan methodology as bench.py.  Run ON TPU from the repo root.
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

from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
from dlwp_cs_tpu.ops import mse
from dlwp_cs_tpu.train import init_state, make_optimizer, make_train_step

N, FILTERS, BATCH, CHAIN, REPEATS = 48, (32, 64, 128), 16, 20, 5


def main() -> int:
    from dlwp_cs_tpu.ops import conv as conv_mod
    from dlwp_cs_tpu.ops.pallas_conv import use_pallas_backward

    dcfg = DataConfig(grid_n=N)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(BATCH, 6, N, N, dcfg.input_channels)).astype(np.float32)
    )
    y = jnp.asarray(
        rng.normal(size=(BATCH, 6, N, N, dcfg.output_channels)).astype(np.float32)
    )
    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.zeros(())))
    t_over = min(
        _wall(lambda: float(trivial(jnp.zeros(())))) for _ in range(20)
    )

    mcfg = UNetConfig(
        output_channels=dcfg.output_channels, filters=FILTERS,
        compute_dtype="bfloat16",
    )
    model = CubeSphereUNet(mcfg)
    params = model.init(jax.random.PRNGKey(0), x)
    opt = make_optimizer(TrainConfig(learning_rate=1e-3))

    real_unprofitable = conv_mod._pallas_unprofitable

    def run(tag: str, kernel_everywhere: bool, bwd: str):
        conv_mod._pallas_unprofitable = (
            (lambda *_: False) if kernel_everywhere else real_unprofitable
        )
        step = make_train_step(model.apply, opt, mse)

        def chain(state, x, y):
            def body(carry, _):
                st, loss = carry
                st, m = step(st, x, y)
                return (st, m["loss"]), None

            (st, loss), _ = lax.scan(
                body, (state, jnp.zeros((), jnp.float32)), None, length=CHAIN
            )
            return loss

        with use_pallas_backward(bwd):
            fn = jax.jit(chain)
            state = init_state(params, opt)
            print(f"[{tag}] compiling...", file=sys.stderr, flush=True)
            float(fn(state, x, y))
        times = sorted(
            _wall(lambda: float(fn(state, x, y))) for _ in range(REPEATS)
        )
        med = times[len(times) // 2]
        ms = (med - t_over) / CHAIN * 1e3
        spread = (times[-1] - times[0]) / CHAIN * 1e3
        print(f"{tag:34s} {ms:7.2f} ms/step  (spread {spread:.2f})",
              flush=True)
        return ms

    try:
        run("production (r4 dispatch, xla bwd)", False, "xla")
        run("kernel-everywhere, xla bwd", True, "xla")
        run("kernel-everywhere, split bwd", True, "split")
        run("production, split bwd", False, "split")
    finally:
        conv_mod._pallas_unprofitable = real_unprofitable
    return 0


def _wall(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
