"""Serving throughput: batched 14-day rollout, bf16 'auto' vs int8 path.

Measures what the ForecastService actually dispatches — a 28-call (56-step)
rollout — at serving batch sizes, for the production conv path and the
quantized one (tools/int8_micro.py showed 1.5-1.9x per BASE conv at batched
shapes; this answers whether that survives the halo composition, where the
ring term stays bf16).

Methodology: bench.py's chained-scan with overhead subtraction.

Usage: python tools/serve_bench.py [--steps 28] [--batches 1 8 16]
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
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 16])
    ap.add_argument("--grid", type=int, default=48)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from dlwp_cs_tpu.geometry import CubedSphere
    from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, UNetConfig
    from dlwp_cs_tpu.rollout import make_rollout_fn

    n = args.grid
    dcfg = DataConfig(grid_n=n)
    cs = CubedSphere(n)
    lat, lon = cs.cell_latlon
    constants = jnp.zeros((6, n, n, len(dcfg.constants)))
    rng = np.random.default_rng(0)

    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.zeros(())))
    t_over = min(
        (lambda t0: (float(trivial(jnp.zeros(()))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(5)
    )
    print(f"overhead={t_over * 1e3:.1f}ms steps={args.steps}", file=sys.stderr, flush=True)

    results = []
    params = None
    for backend in ("auto", "int8"):
        mcfg = UNetConfig(
            output_channels=dcfg.output_channels,
            filters=(32, 64, 128),
            compute_dtype="bfloat16",
            conv_backend=backend,
        )
        model = CubeSphereUNet(mcfg)
        for batch in args.batches:
            window = jnp.asarray(
                rng.normal(
                    size=(batch, dcfg.input_time_steps, 6, n, n,
                          dcfg.n_variables)
                ).astype(np.float32)
            )
            if params is None:
                from dlwp_cs_tpu.data.channels import pack_inputs

                x0 = pack_inputs(
                    window, jnp.zeros(window.shape[:1] + (dcfg.input_time_steps,
                                                          6, n, n)), constants
                )
                params = model.init(jax.random.PRNGKey(0), x0)
            roll = make_rollout_fn(
                model.apply, dcfg, lat=lat, lon=lon, constants=constants,
                steps=args.steps,
            )
            chain = max(2, int(round(8 / max(batch // 8, 1))))

            @jax.jit
            def run(window, roll=roll, chain=chain):
                def body(c, _):
                    fc = roll(params, window + c, 9000.0)
                    return jnp.mean(fc.fields).astype(window.dtype), None

                c, _ = lax.scan(body, jnp.zeros((), window.dtype), None,
                                length=chain)
                return c

            float(run(window))
            walls = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(run(window))
                walls.append(time.perf_counter() - t0)
            walls = sorted((w - t_over) / chain for w in walls)
            med = walls[len(walls) // 2]
            fps = batch / med
            results.append(
                {"backend": backend, "batch": batch,
                 "rollout_ms": round(med * 1e3, 2),
                 "forecasts_per_s": round(fps, 1)}
            )
            print(
                f"{backend:5s} b={batch:3d}: rollout {med * 1e3:7.2f} ms"
                f"  ({fps:7.1f} forecasts/s)",
                file=sys.stderr, flush=True,
            )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
