"""Scaling-efficiency benchmark CLI (BASELINE configs 4-5 harness).

Sweeps (data, spatial) mesh configurations with weak scaling (global batch
proportional to the data axis) and prints one JSON line per configuration:
step time, gridpoints/s, per-chip throughput and efficiency vs 1 device.

On real multi-chip hardware this produces the BASELINE scaling numbers; on a
single chip it reports the 1-chip row. For wiring validation without
hardware:
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/scaling_bench.py --grid 16 --filters 8 16
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=48)
    ap.add_argument("--filters", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--batch-per-device", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--configs",
        default="1x1,2x1,4x1,8x1,2x4",
        help="comma list of DATAxSPATIAL mesh shapes",
    )
    args = ap.parse_args()

    import jax

    from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, UNetConfig
    from dlwp_cs_tpu.parallel import measure_scaling

    dcfg = DataConfig(grid_n=args.grid)
    model = CubeSphereUNet(
        UNetConfig(output_channels=dcfg.output_channels, filters=tuple(args.filters))
    )
    configs = []
    for tok in args.configs.split(","):
        d, s = tok.lower().split("x")
        configs.append((int(d), int(s)))
    print(
        f"[scaling] devices={len(jax.devices())} platform="
        f"{jax.devices()[0].platform} grid=C{args.grid}",
        file=sys.stderr,
    )
    results = measure_scaling(
        model,
        n_grid=args.grid,
        in_channels=dcfg.input_channels,
        out_channels=dcfg.output_channels,
        batch_per_device=args.batch_per_device,
        mesh_configs=tuple(configs),
        iters=args.iters,
    )
    for r in results:
        print(json.dumps(dataclasses.asdict(r)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
