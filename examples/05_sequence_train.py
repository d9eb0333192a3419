"""Example 5: autoregressive sequence fine-tuning.

Workflow parity with the reference's multi-output multi-time-step training
(``DLWPFunctional`` — SURVEY.md §2 row 7): after (or instead of) standard
single-window training, fine-tune with the model applied ``k`` times
autoregressively per step and the loss averaged over all ``k`` windows — the
standard recipe for long-rollout stability.  The inner rollout runs as a
``lax.scan`` inside the jitted train step.

Usage:
  python examples/05_sequence_train.py --workdir /tmp/dlwp [--sequence 3]
      [--steps 200] [--mesh DATAxSPATIAL]
      (expects 01_build_dataset.py to have run)

``--mesh 2x4`` trains data-parallel over 2 device groups with face rows
domain-decomposed over 4 (seam-routed halo exchange under every conv) —
the sharded path of SURVEY.md §5.7 / BASELINE configs 4-5.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from dlwp_cs_tpu.data import SeriesDataset, open_store
from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
from dlwp_cs_tpu.train import (
    init_state,
    make_optimizer,
    make_sequence_loss,
    make_sequence_train_step,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--sequence", type=int, default=3)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--filters", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument(
        "--mesh",
        default=None,
        help="DATAxSPATIAL device mesh, e.g. 2x4 (default: single device)",
    )
    args = ap.parse_args()
    workdir = Path(args.workdir)

    store = open_store(workdir / "predictors_cs.h5").load()
    n = store.grid_n
    cs = CubedSphere(n)
    lat, lon = cs.cell_latlon
    dcfg = DataConfig(grid_n=n, variables=store.variables, constants=store.constant_names)
    ds = SeriesDataset(
        store, dcfg, lat=lat, lon=lon, batch_size=args.batch,
        shuffle=True, sequence=args.sequence,
    )

    model = CubeSphereUNet(
        UNetConfig(output_channels=dcfg.output_channels, filters=tuple(args.filters))
    )
    constants = None
    if store.constants is not None and len(dcfg.constants):
        names = list(store.constant_names)
        constants = store.constants[..., [names.index(c) for c in dcfg.constants]]
    loss = make_sequence_loss(
        model.apply,
        dcfg,
        lat=lat,
        lon=lon,
        constants=constants,
        insol_mean=ds.insol_mean,
        insol_std=ds.insol_std,
        sequence=args.sequence,
    )
    opt = make_optimizer(TrainConfig(learning_rate=args.lr))
    if args.mesh:
        from dlwp_cs_tpu.parallel import create_mesh
        from dlwp_cs_tpu.train import make_sharded_sequence_train_step

        d, sp = (int(v) for v in args.mesh.lower().split("x"))
        mesh = create_mesh(data=d, spatial=sp)
        step = make_sharded_sequence_train_step(
            model.apply,
            dcfg,
            opt,
            mesh,
            lat=lat,
            lon=lon,
            constants=constants,
            insol_mean=ds.insol_mean,
            insol_std=ds.insol_std,
            sequence=args.sequence,
        )
        print(f"mesh: data={d} x spatial={sp} over {d*sp} devices")
    else:
        step = make_sequence_train_step(loss, opt)

    x0 = jnp.zeros((1, 6, n, n, dcfg.input_channels))
    params = model.init(__import__("jax").random.PRNGKey(0), x0)
    state = init_state(params, opt)

    if len(ds) == 0:
        raise SystemExit(
            f"dataset yields no batches (batch_size {ds.batch_size} > "
            f"{ds.n_samples} windows) — lower --batch"
        )
    done = 0
    losses = []
    while done < args.steps:
        for window, targets, t0 in ds:
            state, m = step(
                state, jnp.asarray(window), jnp.asarray(t0), jnp.asarray(targets)
            )
            losses.append(float(m["loss"]))
            done += 1
            if done % 20 == 0:
                print(f"step {done}: seq-loss {np.mean(losses[-20:]):.5f}")
            if done >= args.steps:
                break
    print(f"final sequence loss (mean of last 20): {np.mean(losses[-20:]):.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
