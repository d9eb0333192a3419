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


def _timeit(fn, *args, warmup=2, iters=10):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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
    # (state buffers are donated, so thread the state through the loop; the
    # scalar loss readback each iteration forces a true device sync — plain
    # block_until_ready under-measures through this environment's remote
    # dispatch tunnel)
    for _ in range(3):  # compile + warmup
        state, _m = step(state, x, y)
    float(_m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _m = step(state, x, y)
        float(_m["loss"])
    t_step = (time.perf_counter() - t0) / iters
    gridpoints = batch * 6 * n * n
    gps = gridpoints / t_step

    # --- op-level baseline comparison (same hardware, same shapes) --------
    # Methodology: chain CHAIN fwd+bwd conv steps inside one jitted lax.scan
    # and read back a scalar — per-call host timing through the remote
    # dispatch tunnel is unreliable (see PERF.md).
    from jax import lax

    cin, cout = 64, 64
    chain_len = 2 if smoke else 10
    xo = jnp.asarray(rng.normal(size=(batch, 6, n, n, cin)).astype(np.float32))
    k_eq = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)) * 0.05
    k_po = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)) * 0.05

    def chained_fwdbwd(conv_fn):
        @jax.jit
        def run(x0):
            def body(h, _):
                g = jax.grad(lambda v: jnp.sum(conv_fn(v) ** 2))(h)
                return h - 1e-6 * g, None

            h, _ = lax.scan(body, x0, None, length=chain_len)
            return jnp.sum(h)

        return run

    def time_chain(run):
        float(run(xo))  # compile + warmup
        t_best = float("inf")
        for _ in range(max(2, iters // 3)):
            t0 = time.perf_counter()
            float(run(xo))
            t_best = min(t_best, time.perf_counter() - t0)
        return t_best / chain_len

    print("[bench] compiling op-level fused/naive paths...", file=sys.stderr, flush=True)
    t_fused = time_chain(chained_fwdbwd(lambda v: cs_conv(v, k_eq, k_po)))
    t_naive = time_chain(
        chained_fwdbwd(lambda v: naive_reference_conv(v, k_eq, k_po))
    )
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

    def run_roll():
        fc = rollout(state.params, window, 9000.0)
        return float(fc.fields[0, 0, 0, 0, 0, 0])  # forced scalar sync

    run_roll()  # compile
    t_roll = float("inf")
    for _ in range(max(3, iters // 2)):
        t0 = time.perf_counter()
        run_roll()
        t_roll = min(t_roll, time.perf_counter() - t0)

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
