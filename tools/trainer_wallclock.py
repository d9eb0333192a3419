"""Real ``Trainer.fit`` wall-clock vs the bench's chained step (VERDICT r2 #7).

bench.py times the train step inside one jitted ``lax.scan`` — the floor.
This tool measures what a user actually gets from ``Trainer.fit`` at the
flagship configuration (C48, (32,64,128), b=16, bf16) with device-resident
synthetic batches (so the input pipeline contributes nothing and the gap is
pure trainer overhead: dispatch cadence, metric readback, bookkeeping).

Run ON TPU: ``python tools/trainer_wallclock.py [--fused k] [--steps N]``.
Prints ms/step for epoch 2+ (epoch 1 pays compile) and the per-step
dispatch/data-wait decomposition the Trainer already records.

``--store`` (VERDICT r4 next #5 / BASELINE config 4): instead of
device-resident synthetic batches, feed the REAL input pipeline at
flagship scale — an on-disk HDF5 predictor store (written once, ~450 MB)
-> lazy ``H5Store`` -> ``SeriesDataset`` (shuffled windows, h5py sorted-
unique gathers, host-side normalization + insolation) ->
``PrefetchIterator`` (depth 2, host->device) -> ``Trainer.fit``.  The gap
between this row and the synthetic row IS the input-pipeline overhead;
``data_wait_s`` decomposes it (time the device actually stalled on the
host iterator).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
from dlwp_cs_tpu.train import Trainer

N, FILTERS, BATCH = 48, (32, 64, 128), 16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", type=int, default=8)
    ap.add_argument("--steps", type=int, default=128, help="steps per epoch")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--metrics-every", type=int, default=None,
                    help="flush cadence in FUSED DISPATCHES (default: once "
                    "per epoch)")
    ap.add_argument("--store", action="store_true",
                    help="feed the real HDF5 -> SeriesDataset -> "
                    "PrefetchIterator pipeline instead of device-resident "
                    "synthetic batches")
    ap.add_argument("--store-dir", default="/tmp/dlwp_storebench",
                    help="where the synthetic predictor store lives "
                    "(written on first use)")
    ap.add_argument("--workers", type=int, default=6,
                    help="batch-assembly threads for --store (0 = serial)")
    args = ap.parse_args()

    dcfg = DataConfig(grid_n=N)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(BATCH, 6, N, N, dcfg.input_channels)).astype(np.float32)
    )
    y = jnp.asarray(
        rng.normal(size=(BATCH, 6, N, N, dcfg.output_channels)).astype(np.float32)
    )
    mcfg = UNetConfig(
        output_channels=dcfg.output_channels,
        filters=FILTERS,
        compute_dtype="bfloat16",
    )
    model = CubeSphereUNet(mcfg)
    me = args.metrics_every or max(1, args.steps // args.fused)
    tcfg = TrainConfig(
        learning_rate=1e-3,
        max_epochs=args.epochs,
        fused_steps=args.fused,
        metrics_every=me,
        restore_best_weights=False,
        early_stopping_patience=10**6,
    )
    trainer = Trainer(model, tcfg)
    state = trainer.init(x)

    if args.store:
        epoch_data, n_steps = _store_pipeline(args, dcfg)
        args.steps = n_steps
    else:
        def epoch_data():
            return ((x, y) for _ in range(args.steps))

    times = []
    for ep in range(args.epochs):
        t0 = time.perf_counter()
        state = trainer.fit(state, epoch_data, verbose=False, epochs=ep + 1)
        trainer._epochs_done = ep + 1
        times.append(time.perf_counter() - t0)
    per_step = [t / args.steps * 1e3 for t in times]
    steady = min(per_step[1:]) if len(per_step) > 1 else per_step[0]
    recs = trainer.history.steps[-args.steps :]
    disp = sum(r["dispatch_s"] for r in recs) / max(len(recs), 1) * 1e3
    wait = sum(r["data_wait_s"] for r in recs) / max(len(recs), 1) * 1e3
    print(
        f"platform={jax.devices()[0].platform} fused={args.fused} "
        f"steps/epoch={args.steps}"
    )
    for i, ms in enumerate(per_step):
        print(f"epoch {i}: {ms:7.2f} ms/step")
    print(
        f"steady-state: {steady:.2f} ms/step  "
        f"(mean dispatch {disp:.2f} ms, data wait {wait:.3f} ms per record)"
    )
    return 0


def _store_pipeline(args, dcfg):
    """(epoch_data, steps_per_epoch): the real store-fed input path."""
    from dlwp_cs_tpu.data import SeriesDataset, open_store, prefetch_to_device
    from dlwp_cs_tpu.data.store import MemoryStore, write_store
    from dlwp_cs_tpu.geometry import CubedSphere

    path = Path(args.store_dir) / "predictors_cs.h5"
    t_total = args.steps * BATCH + 8  # enough windows for one epoch
    if not path.exists() or _store_too_small(path, t_total):
        print(f"[store] writing {path} ({t_total} samples)...", flush=True)
        path.parent.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(7)
        mem = MemoryStore.from_raw(
            rng.normal(size=(t_total, 6, N, N, dcfg.n_variables)).astype(
                np.float32
            ),
            np.arange(t_total) * (dcfg.step_hours / 24.0),
            dcfg.variables,
            constants=rng.normal(size=(6, N, N, len(dcfg.constants))).astype(
                np.float32
            ),
            constant_names=dcfg.constants,
        )
        write_store(path, mem)
    h5 = open_store(path)  # LAZY: fields stay on disk
    cs = CubedSphere(N)
    lat, lon = cs.cell_latlon
    ds = SeriesDataset(
        h5, dcfg, lat=lat, lon=lon, batch_size=BATCH, shuffle=True,
        workers=args.workers,
    )
    steps = min(len(ds), args.steps)

    def epoch_data():
        def limited():
            for i, item in enumerate(iter(ds)):
                if i >= steps:
                    return
                yield item

        return prefetch_to_device(limited())

    print(f"[store] H5 {path} -> SeriesDataset ({ds.n_samples} windows) "
          f"-> prefetch(depth=2), {steps} steps/epoch", flush=True)
    return epoch_data, steps


def _store_too_small(path, t_total) -> bool:
    import h5py

    with h5py.File(path, "r") as f:
        return f["fields"].shape[0] < t_total


if __name__ == "__main__":
    sys.exit(main())
