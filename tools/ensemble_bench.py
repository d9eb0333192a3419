"""Ensemble rollout throughput: folded-batch members vs sequential rollouts.

Measures the design claim in rollout/ensemble.py — that folding M members
into the rollout's batch axis (ONE lax.scan dispatch) beats M sequential
b=1 rollouts (the reference-style host loop) — and probes the scan
``unroll`` knob for the serving rollout.

Methodology: bench.py's chained-scan with overhead subtraction.

Usage: python tools/ensemble_bench.py [--steps 28] [--members 8 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--members", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--grid", type=int, default=48)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--unrolls", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()

    from dlwp_cs_tpu.data.channels import pack_inputs
    from dlwp_cs_tpu.geometry import CubedSphere
    from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, UNetConfig
    from dlwp_cs_tpu.rollout import make_ensemble_rollout, make_rollout_fn

    n = args.grid
    dcfg = DataConfig(grid_n=n)
    cs = CubedSphere(n)
    lat, lon = cs.cell_latlon
    constants = jnp.zeros((6, n, n, len(dcfg.constants)))
    rng = np.random.default_rng(0)
    mcfg = UNetConfig(
        output_channels=dcfg.output_channels,
        filters=(32, 64, 128),
        compute_dtype="bfloat16",
    )
    model = CubeSphereUNet(mcfg)
    window1 = jnp.asarray(
        rng.normal(size=(1, dcfg.input_time_steps, 6, n, n,
                         dcfg.n_variables)).astype(np.float32)
    )
    x0 = pack_inputs(
        window1,
        jnp.zeros(window1.shape[:1] + (dcfg.input_time_steps, 6, n, n)),
        constants,
    )
    params = model.init(jax.random.PRNGKey(0), x0)

    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.zeros(())))
    t_over = min(
        (lambda t0: (float(trivial(jnp.zeros(()))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(5)
    )
    print(f"overhead={t_over * 1e3:.1f}ms steps={args.steps}",
          file=sys.stderr, flush=True)

    def timed(run, *a):
        jax.block_until_ready(run(*a))
        walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(run(*a))
            walls.append(time.perf_counter() - t0)
        walls.sort()
        return max(walls[len(walls) // 2] - t_over, 0.0)

    results = []

    def rollout_factory(unroll):
        return make_rollout_fn(
            model.apply, dcfg, lat=lat, lon=lon, constants=constants,
            steps=args.steps, unroll=unroll,
        )

    # --- serving rollout unroll probe (b=1) ---------------------------------
    for unroll in args.unrolls:
        roll = rollout_factory(unroll)

        @jax.jit
        def run1(window, roll=roll):
            return roll(params, window, 9000.0).fields.mean()

        ms = timed(run1, window1) * 1e3
        results.append({"what": f"rollout b=1 unroll={unroll}",
                        "ms": round(ms, 2)})
        print(f"rollout b=1 unroll={unroll}: {ms:7.2f} ms",
              file=sys.stderr, flush=True)

    # --- ensemble: folded vs sequential --------------------------------------
    roll1 = rollout_factory(1)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run_seq(window, m):
        # reference-style: M sequential b=1 rollouts inside one jit (still
        # generous to the baseline — no per-member dispatch/host overhead)
        def body(c, _):
            f = roll1(params, window + c, 9000.0).fields
            return jnp.mean(f).astype(window.dtype), None

        c, _ = lax.scan(body, jnp.zeros((), window.dtype), None, length=m)
        return c

    for m in args.members:
        ens = jax.jit(make_ensemble_rollout(
            model.apply, dcfg, lat=lat, lon=lon, constants=constants,
            steps=args.steps, members=m,
        ))
        key = jax.random.PRNGKey(1)

        def run_folded(window, ens=ens, key=key):
            out = ens(params, window, 9000.0, key, 0.05)
            return out.mean.mean()

        t_fold = timed(jax.jit(run_folded), window1) * 1e3
        t_seq = timed(run_seq, window1, m) * 1e3
        results.append({
            "what": f"ensemble M={m}",
            "folded_ms": round(t_fold, 2),
            "sequential_ms": round(t_seq, 2),
            "speedup": round(t_seq / max(t_fold, 1e-9), 2),
        })
        print(
            f"ensemble M={m:3d}: folded {t_fold:8.2f} ms  "
            f"sequential {t_seq:8.2f} ms  speedup {t_seq / t_fold:5.2f}x",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
