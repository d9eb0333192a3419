"""Measure REAL Trainer.fit wall-clock on TPU (VERDICT r1 #5).

bench.py times an in-graph chained scan — the best case.  This script runs
the actual `Trainer.fit` loop (host loop + prefetched synthetic data +
buffered metric fetch) for a few epochs at the bench configuration and
reports wall-clock seconds per step, to be compared against bench's chained
step time (target: within ~15%).

Run ON TPU from the repo root: ``python tools/trainer_wallclock.py``.
"""

from __future__ import annotations

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
    )
    rng = np.random.default_rng(0)
    batches = [
        (
            rng.normal(size=(BATCH, 6, N, N, dcfg.input_channels)).astype(np.float32),
            rng.normal(size=(BATCH, 6, N, N, dcfg.output_channels)).astype(np.float32),
        )
        for _ in range(STEPS_PER_EPOCH)
    ]
    trainer = Trainer(model, tcfg)
    state = trainer.init(jnp.asarray(batches[0][0]))
    # epoch 0 pays compilation; measure epochs 1..E-1
    t_epochs = []
    for e in range(EPOCHS):
        t0 = time.perf_counter()
        state = trainer.fit(
            state, lambda: prefetch_to_device(iter(batches)), epochs=1,
            verbose=False,
        )
        t_epochs.append(time.perf_counter() - t0)
        print(f"epoch {e}: {t_epochs[-1]:.2f}s "
              f"({t_epochs[-1] / STEPS_PER_EPOCH * 1e3:.2f} ms/step)", flush=True)
    best = min(t_epochs[1:])
    waits = [r["data_wait_s"] for r in trainer.history.steps[STEPS_PER_EPOCH:]]
    print(
        f"trainer wall-clock: {best / STEPS_PER_EPOCH * 1e3:.2f} ms/step "
        f"(platform={jax.devices()[0].platform}, metrics_every="
        f"{tcfg.metrics_every}, mean data_wait={np.mean(waits) * 1e3:.2f} ms)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
