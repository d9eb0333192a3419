"""Measure REAL Trainer.fit wall-clock on TPU (VERDICT r1 #5).

bench.py times an in-graph chained scan — the best case.  This script runs
the actual `Trainer.fit` loop for a few epochs at the bench configuration
and reports wall-clock seconds per step, to be compared against bench's
chained step time.

Modes (combine freely):
  --fused K        TrainConfig.fused_steps=K (K optimizer steps per dispatch)
  --device-data    pre-put the synthetic batches on device once (isolates
                   the host loop from this environment's slow remote-tunnel
                   host->device transfer, ~340 ms for a 17.7 MB batch)

Measured on 1x v5e (PERF.md round 2): host-fed unfused 397 ms/step
(transfer-bound over the tunnel), device-resident unfused 56 ms/step
(dispatch-bound), device-resident fused=8 ~16 ms/step (= bench's 13.8 ms
plus amortized dispatch).

Run ON TPU from the repo root: ``python tools/trainer_wallclock.py [flags]``.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from dlwp_cs_tpu.data.prefetch import prefetch_to_device
from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
from dlwp_cs_tpu.train import Trainer

N, FILTERS, BATCH = 48, (32, 64, 128), 16
STEPS_PER_EPOCH, EPOCHS = 32, 4


def main() -> int:
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--device-data", action="store_true")
    args = ap.parse_args()

    dcfg = DataConfig(grid_n=N)
    mcfg = UNetConfig(
        output_channels=dcfg.output_channels,
        filters=FILTERS,
        compute_dtype="bfloat16",
        conv_backend="auto",
    )
    model = CubeSphereUNet(mcfg)
    tcfg = TrainConfig(
        learning_rate=1e-3,
        max_epochs=EPOCHS,
        checkpoint_every_epochs=10_000,
        metrics_every=8,
        fused_steps=args.fused,
        restore_best_weights=False,  # no per-epoch params download
    )
    rng = np.random.default_rng(0)
    batches = [
        (
            rng.normal(size=(BATCH, 6, N, N, dcfg.input_channels)).astype(np.float32),
            rng.normal(size=(BATCH, 6, N, N, dcfg.output_channels)).astype(np.float32),
        )
        for _ in range(STEPS_PER_EPOCH)
    ]
    if args.device_data:
        batches = jax.device_put(batches)
        jax.block_until_ready(batches)
        data = lambda: iter(batches)
    else:
        data = lambda: prefetch_to_device(iter(batches))
    trainer = Trainer(model, tcfg)
    state = trainer.init(jnp.asarray(np.asarray(batches[0][0])))
    # ONE fit call (per-epoch timings from history); epoch 0 pays compilation
    state = trainer.fit(state, data, verbose=False)
    t_epochs = [r["seconds"] for r in trainer.history.epochs]
    for e, t in enumerate(t_epochs):
        print(f"epoch {e}: {t:.2f}s ({t / STEPS_PER_EPOCH * 1e3:.2f} ms/step)",
              flush=True)
    best = min(t_epochs[1:])
    waits = [r["data_wait_s"] for r in trainer.history.steps[STEPS_PER_EPOCH:]]
    print(
        f"trainer wall-clock: {best / STEPS_PER_EPOCH * 1e3:.2f} ms/step "
        f"(platform={jax.devices()[0].platform}, fused_steps={args.fused}, "
        f"device_data={args.device_data}, metrics_every={tcfg.metrics_every}, "
        f"mean data_wait={np.mean(waits) * 1e3:.2f} ms)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
