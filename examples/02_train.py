"""Example 2: train the cubed-sphere U-Net on a predictor store.

Workflow parity with the reference's train scripts (SURVEY.md §3.2):
series windowing with insolation + constants, U-Net, Adam/MSE over the
2-step output window, early stopping with a minimum-epoch floor,
periodic checkpoints, best-weights restore — all around a single jitted
train step with host->device prefetch.

Usage:
  python examples/02_train.py --workdir /tmp/dlwp [--epochs 10]
      [--batch 16] [--filters 32 64 128] [--bf16] [--data-parallel]
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

from dlwp_cs_tpu.data import SeriesDataset, open_store, prefetch_to_device
from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.models import (
    ConvLSTMConfig,
    DataConfig,
    ExperimentConfig,
    TrainConfig,
    UNetConfig,
    build_model,
)
from dlwp_cs_tpu.train import Trainer
from dlwp_cs_tpu.utils import save_checkpoint, save_json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--filters", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument(
        "--model", choices=("unet", "convlstm"), default="unet",
        help="model family: cubed-sphere U-Net (default) or the recurrent "
        "ConvLSTM stack (the reference's is_recurrent path)",
    )
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--val-frac", type=float, default=0.15)
    ap.add_argument("--min-epochs", type=int, default=2)
    ap.add_argument("--patience", type=int, default=5)
    ap.add_argument("--workers", type=int, default=2,
                    help="batch-assembly threads (0 = serial)")
    args = ap.parse_args()
    workdir = Path(args.workdir)

    store = open_store(workdir / "predictors_cs.h5").load()
    n = store.grid_n
    cs = CubedSphere(n)
    lat, lon = cs.cell_latlon

    dcfg = DataConfig(
        grid_n=n,
        variables=store.variables,
        constants=store.constant_names,
    )
    # Chronological train/val split (the reference's year-split analog).
    t_total = store.fields.shape[0]
    split = int(t_total * (1 - args.val_frac))
    train_store = dataclasses.replace(
        store, fields=store.fields[:split], times=store.times[:split]
    )
    val_store = dataclasses.replace(
        store, fields=store.fields[split:], times=store.times[split:]
    )
    common = dict(lat=lat, lon=lon, batch_size=args.batch)
    train_ds = SeriesDataset(
        train_store, dcfg, shuffle=True, workers=args.workers, **common
    )
    val_ds = SeriesDataset(val_store, dcfg, **common)

    if args.model == "convlstm":
        mcfg = ConvLSTMConfig(
            output_channels=dcfg.output_channels,
            filters=tuple(args.filters),
            input_time_steps=dcfg.input_time_steps,
            variable_channels=dcfg.n_variables,
            add_insolation=dcfg.add_insolation,
            compute_dtype="bfloat16" if args.bf16 else "float32",
        )
    else:
        mcfg = UNetConfig(
            output_channels=dcfg.output_channels,
            filters=tuple(args.filters),
            compute_dtype="bfloat16" if args.bf16 else "float32",
        )
    tcfg = TrainConfig(
        batch_size=args.batch,
        learning_rate=args.lr,
        max_epochs=args.epochs,
        min_epochs=args.min_epochs,
        early_stopping_patience=args.patience,
        checkpoint_every_epochs=max(1, args.epochs // 5),
    )
    model = build_model(mcfg)
    trainer = Trainer(model, tcfg, workdir=workdir)
    x0, _ = train_ds.make_batch(train_ds._starts[: args.batch])
    state = trainer.init(x0)
    state = trainer.fit(
        state,
        lambda: prefetch_to_device(iter(train_ds)),
        val_data=lambda: prefetch_to_device(iter(val_ds)),
    )

    save_checkpoint(workdir / "model", state, step=int(state.step))
    cfg = ExperimentConfig(data=dcfg, model=mcfg, train=tcfg)
    save_json(workdir / "model" / "experiment.json", cfg.to_json())
    save_json(
        workdir / "model" / "stats.json",
        {
            "mean": [float(v) for v in store.mean],
            "std": [float(v) for v in store.std],
            "insol_mean": train_ds.insol_mean,
            "insol_std": train_ds.insol_std,
        },
    )
    print(f"saved model to {workdir / 'model'}; best loss in history:")
    print(min(r["val_loss"] or r["train_loss"] for r in trainer.history.epochs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
