"""Benchmark: cubed-sphere U-Net training throughput on one chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Primary metric: grid-points/s/chip for the full DLWP-CS training step
(fwd+bwd, C48, 4 prognostic variables — BASELINE.json config 2).  The
reference publishes no machine-throughput numbers (BASELINE.md), so
``vs_baseline`` is the measured speedup of this framework's fused conv path
over a faithful reference-style implementation benchmarked in the same run
(separate padding layer materializing the padded tensor + six sequential
per-face conv dispatches, as in DLWP-CS's Keras graph — SURVEY.md §3.2).

Also reports (to stderr) the 14-day 56-step rollout wall-clock (config 3).

Usage: ``python bench.py [--smoke]`` (--smoke: tiny sizes, CPU-friendly).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _wall(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def naive_reference_conv(x, k_eq, k_pole, width=1):
    """Reference-style CS conv: standalone pad layer + per-face conv loop.

    Mirrors the Keras graph structure of DLWP-CS (CubeSpherePadding2D then
    CubeSphereConv2D dispatching a conv per face) for an apples-to-apples
    baseline on identical hardware.
    """
    import jax.numpy as jnp
    from jax import lax

    from dlwp_cs_tpu.ops import cs_pad

    xp = cs_pad(x, width)
    outs = []
    for f in range(6):
        k = k_eq if f < 4 else k_pole
        outs.append(
            lax.conv_general_dilated(
                xp[:, f],
                k,
                (1, 1),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
    return jnp.stack(outs, axis=1)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true", help="tiny CPU-friendly run")
    parser.add_argument("--batch", type=int, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
    from dlwp_cs_tpu.ops import cs_conv, mse
    from dlwp_cs_tpu.train import init_state, make_optimizer, make_train_step

    smoke = args.smoke
    n = 12 if smoke else 48
    # Weyn et al. 2020-scale flagship U-Net (SURVEY.md §6)
    filters = (4, 8) if smoke else (32, 64, 128)
    batch = args.batch or (2 if smoke else 16)
    iters = 3 if smoke else 10

    dcfg = DataConfig(grid_n=n)
    mcfg = UNetConfig(
        output_channels=dcfg.output_channels,
        filters=filters,
        compute_dtype="bfloat16" if not smoke else "float32",
    )
    model = CubeSphereUNet(mcfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(batch, 6, n, n, dcfg.input_channels)).astype(np.float32)
    )
    y = jnp.asarray(
        rng.normal(size=(batch, 6, n, n, dcfg.output_channels)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)
    opt = make_optimizer(TrainConfig(learning_rate=1e-3))
    state = init_state(params, opt)
    step = make_train_step(model.apply, opt, mse)
    print("[bench] compiling train step...", file=sys.stderr, flush=True)

    # --- config 2: full train step throughput -----------------------------
    # Timing methodology: this environment dispatches through a remote
    # tunnel with ~tens-of-ms fixed latency per synchronizing call, and
    # block_until_ready alone under-measures.  All timings below are
    # DIFFERENTIAL: run N_big and N_small iterations (async dispatch
    # pipelines them on-device) with one scalar readback at the end, and
    # divide the difference — fixed overhead cancels exactly.
    def run_steps(state, k):
        for _ in range(k):
            state, m = step(state, x, y)
        float(m["loss"])  # single sync
        return state

    state = run_steps(state, 2)  # compile + warmup
    n_small, n_big = 2, 2 + 3 * iters

    def t_of(k):
        nonlocal state
        t0 = time.perf_counter()
        state = run_steps(state, k)
        return time.perf_counter() - t0

    t_small = min(t_of(n_small) for _ in range(2))
    t_big = min(t_of(n_big) for _ in range(2))
    t_step = max((t_big - t_small) / (n_big - n_small), 1e-9)
    gridpoints = batch * 6 * n * n
    gps = gridpoints / t_step

    # --- op-level baseline comparison (same hardware, same shapes) --------
    # Methodology: chain CHAIN fwd+bwd conv steps inside one jitted lax.scan
    # and read back a scalar — per-call host timing through the remote
    # dispatch tunnel is unreliable (see PERF.md).
    from jax import lax

    cin, cout = 64, 64
    k_small, k_big = (2, 6) if smoke else (5, 35)
    xo = jnp.asarray(rng.normal(size=(batch, 6, n, n, cin)).astype(np.float32))
    k_eq = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)) * 0.05
    k_po = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)) * 0.05

    def chained_fwdbwd(conv_fn, length):
        @jax.jit
        def run(x0):
            def body(h, _):
                g = jax.grad(lambda v: jnp.sum(conv_fn(v) ** 2))(h)
                return h - 1e-6 * g, None

            h, _ = lax.scan(body, x0, None, length=length)
            return jnp.sum(h)

        return run

    def time_chain(conv_fn):
        # differential over two chain lengths cancels fixed call overhead
        runs = {k: chained_fwdbwd(conv_fn, k) for k in (k_small, k_big)}
        ts = {}
        for k, run in runs.items():
            float(run(xo))  # compile + warmup
            ts[k] = min(
                _wall(lambda: float(run(xo)))
                for _ in range(max(2, iters // 3))
            )
        return max((ts[k_big] - ts[k_small]) / (k_big - k_small), 1e-9)

    print("[bench] compiling op-level fused/naive paths...", file=sys.stderr, flush=True)
    t_fused = time_chain(lambda v: cs_conv(v, k_eq, k_po))
    t_naive = time_chain(lambda v: naive_reference_conv(v, k_eq, k_po))
    speedup = t_naive / t_fused

    # --- config 3: 56-step rollout wall-clock (reported to stderr) --------
    from dlwp_cs_tpu.geometry import CubedSphere
    from dlwp_cs_tpu.rollout import make_rollout_fn

    cs = CubedSphere(n)
    lat, lon = cs.cell_latlon
    steps = 4 if smoke else 28  # 28 calls x 2 output steps = 56 steps / 14 d
    rollout = jax.jit(
        make_rollout_fn(
            model.apply,
            dcfg,
            lat=lat,
            lon=lon,
            constants=jnp.zeros((6, n, n, len(dcfg.constants))),
            steps=steps,
        )
    )
    window = jnp.asarray(
        rng.normal(size=(1, dcfg.input_time_steps, 6, n, n, dcfg.n_variables)).astype(
            np.float32
        )
    )
    print("[bench] compiling rollout...", file=sys.stderr, flush=True)

    def run_rolls(k):
        for _ in range(k):
            fc = rollout(state.params, window, 9000.0)
        return float(fc.fields[0, 0, 0, 0, 0, 0])  # single sync

    run_rolls(1)  # compile
    r_small, r_big = 1, 5
    tr_small = min(_wall(lambda: run_rolls(r_small)) for _ in range(3))
    tr_big = min(_wall(lambda: run_rolls(r_big)) for _ in range(3))
    t_roll = max((tr_big - tr_small) / (r_big - r_small), 1e-9)

    print(
        f"[bench] n={n} batch={batch} step={t_step * 1e3:.2f}ms "
        f"rollout({steps * dcfg.output_time_steps}x6h)={t_roll * 1e3:.1f}ms "
        f"op fused={t_fused * 1e3:.2f}ms naive={t_naive * 1e3:.2f}ms "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "train_step_gridpoints_per_s_per_chip",
                "value": round(gps, 1),
                "unit": "gridpoint/s",
                "vs_baseline": round(speedup, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
