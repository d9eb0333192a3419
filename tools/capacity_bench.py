"""Capacity sweep: train-step MFU across model scales (1 chip).

The flagship DLWP-CS shapes (C48, 32/64/128 channels) structurally underfill
the 128x128 MXU — a (n, n, 32)x(32, 32) tap leaves it ~94% idle, which is why
the headline bench sits at single-digit %-of-peak no matter the formulation
(PERF.md round-3: the halo machinery is ~1.8 ms of a ~9-11 ms step; the rest
is XLA's own conv at small-channel fill).  This sweep measures the SAME
framework at scale-up configurations (wider channels / higher resolution —
where production weather models actually live, e.g. a C96 or channel-doubled
DLWP) to show throughput is shape-bound, not framework-bound.

Methodology identical to bench.py: K steps in one jitted lax.scan, overhead
subtracted, median over repeats.

Usage: python tools/capacity_bench.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def unet_train_flops(n, filters, batch, in_ch, out_ch) -> float:
    """Analytic conv MACs of one train step (fwd + ~2x bwd) — same counting
    as bench.py (kept in sync by tests/test_capacity_flops.py)."""
    convs = []
    cin = in_ch
    sizes = [n // (2**i) for i in range(len(filters))]
    skips = []
    for lvl, f in enumerate(filters[:-1]):
        convs += [(sizes[lvl], cin, f), (sizes[lvl], f, f)]
        skips.append(f)
        cin = f
    convs += [(sizes[-1], cin, filters[-1]), (sizes[-1], filters[-1], filters[-1])]
    cin = filters[-1]
    for lvl in range(len(filters) - 2, -1, -1):
        f = filters[lvl]
        convs += [(sizes[lvl], cin + skips[lvl], f), (sizes[lvl], f, f)]
        cin = f
    fwd = sum(2 * batch * 6 * s * s * 9 * ci * co for s, ci, co in convs)
    fwd += 2 * batch * 6 * n * n * cin * out_ch
    return 3.0 * fwd


def measure(n, filters, batch, *, chain, repeats, t_over):
    from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
    from dlwp_cs_tpu.ops import mse
    from dlwp_cs_tpu.train import init_state, make_optimizer, make_train_step

    dcfg = DataConfig(grid_n=n)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(batch, 6, n, n, dcfg.input_channels)).astype(np.float32)
    )
    y = jnp.asarray(
        rng.normal(size=(batch, 6, n, n, dcfg.output_channels)).astype(np.float32)
    )
    mcfg = UNetConfig(
        output_channels=dcfg.output_channels,
        filters=tuple(filters),
        compute_dtype="bfloat16",
    )
    model = CubeSphereUNet(mcfg)
    params = model.init(jax.random.PRNGKey(0), x)
    opt = make_optimizer(TrainConfig(learning_rate=1e-3))
    step = make_train_step(model.apply, opt, mse, jit=False)

    @jax.jit
    def run(state):
        def body(s, _):
            s, m = step(s, x, y)
            return s, m["loss"]

        s, losses = lax.scan(body, state, None, length=chain)
        return s, losses[-1]

    state = init_state(params, opt)
    state, loss = run(state)
    float(loss)
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, loss = run(state)
        float(loss)
        walls.append(time.perf_counter() - t0)
    per = sorted((w - t_over) / chain for w in walls)
    med = per[len(per) // 2]
    flops = unet_train_flops(n, filters, batch, dcfg.input_channels,
                             dcfg.output_channels)
    return med, per[-1] - per[0], flops


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.zeros(())))
    t_over = min(
        (lambda t0: (float(trivial(jnp.zeros(()))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(5)
    )
    dev = jax.devices()[0]
    peak = 197.0 if dev.platform == "tpu" else 0.0
    print(f"platform={dev.platform} kind={getattr(dev, 'device_kind', '?')} "
          f"overhead={t_over * 1e3:.1f}ms", file=sys.stderr)

    configs = [
        # (label, n, filters, batch, chain)
        ("flagship C48 (32,64,128) b16", 48, (32, 64, 128), 16, 20),
        ("wide C48 (64,128,256) b16", 48, (64, 128, 256), 16, 20),
        ("wider C48 (128,256,512) b8", 48, (128, 256, 512), 8, 10),
        ("hires C96 (32,64,128) b8", 96, (32, 64, 128), 8, 10),
        ("hires+wide C96 (64,128,256) b8", 96, (64, 128, 256), 8, 10),
        ("hires+wide C96 (64,128,256,256) b8", 96, (64, 128, 256, 256), 8, 10),
    ]
    if args.quick:
        configs = configs[:2]

    rows = []
    for label, n, filters, batch, chain in configs:
        try:
            med, spread, flops = measure(
                n, filters, batch, chain=chain, repeats=args.repeats,
                t_over=t_over,
            )
        except Exception as e:  # noqa: BLE001 — report per-config failures
            print(f"{label}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            continue
        gps = batch * 6 * n * n / med
        tf = flops / med / 1e12
        pct = 100.0 * tf / peak if peak else 0.0
        rows.append(
            {
                "label": label, "n": n, "filters": list(filters),
                "batch": batch, "step_ms": round(med * 1e3, 3),
                "spread_ms": round(spread * 1e3, 3),
                "gridpoints_per_s": round(gps, 1),
                "tflops_per_s": round(tf, 2),
                "pct_of_bf16_peak": round(pct, 2),
            }
        )
        print(
            f"{label:38s} step={med * 1e3:8.2f}ms+-{spread * 1e3 / 2:5.2f} "
            f"{gps / 1e6:6.2f}M gp/s  {tf:6.1f} TF/s"
            + (f"  {pct:5.1f}% peak" if peak else ""),
            file=sys.stderr,
        )
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
