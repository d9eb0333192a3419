"""Example 3: autoregressive forecasts from a trained model.

Workflow parity with the reference's predict scripts + TimeSeriesEstimator
(SURVEY.md §3.3), except the whole rollout is one on-device lax.scan.

Usage:
  python examples/03_forecast.py --workdir /tmp/dlwp [--days 14]
      [--inits 4] (forecasts start from the last windows of the store)
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax

from dlwp_cs_tpu.data import open_store
from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.models import ExperimentConfig, build_model
from dlwp_cs_tpu.rollout import TimeSeriesEstimator
from dlwp_cs_tpu.train import init_state, make_optimizer
from dlwp_cs_tpu.utils import load_json, restore_checkpoint


def load_model(workdir: Path):
    # experiment.json holds the ExperimentConfig JSON document (a string
    # payload written by save_json in example 02).
    cfg = ExperimentConfig.from_json(load_json(workdir / "model" / "experiment.json"))
    stats = load_json(workdir / "model" / "stats.json")
    model = build_model(cfg.resolved_model())
    n = cfg.data.grid_n
    import jax.numpy as jnp

    x0 = jnp.zeros((1, 6, n, n, cfg.data.input_channels))
    params = model.init(jax.random.PRNGKey(0), x0)
    template = init_state(params, make_optimizer(cfg.train))
    state, _ = restore_checkpoint(workdir / "model", template)
    return model, state, cfg, stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--days", type=float, default=14.0)
    ap.add_argument("--inits", type=int, default=4)
    args = ap.parse_args()
    workdir = Path(args.workdir)

    model, state, cfg, stats = load_model(workdir)
    dcfg = cfg.data
    store = open_store(workdir / "predictors_cs.h5").load()
    n = store.grid_n
    cs = CubedSphere(n)
    lat, lon = cs.cell_latlon

    mean = np.asarray(stats["mean"], np.float32)
    std = np.asarray(stats["std"], np.float32)
    t_in = dcfg.input_time_steps
    calls = int(round(args.days * 24 / (dcfg.step_hours * dcfg.output_time_steps)))

    # Initial windows from the held-out tail, leaving enough samples after
    # each init so example 04 has verifying truth at every lead.
    n_leads = calls * dcfg.output_time_steps
    last_start = store.fields.shape[0] - t_in - n_leads
    if last_start < args.inits - 1:
        raise SystemExit(
            f"store too short: need {t_in + n_leads + args.inits - 1} samples, "
            f"have {store.fields.shape[0]} — reduce --days or --inits"
        )
    starts = np.arange(args.inits) + (last_start - args.inits + 1)
    windows = np.stack(
        [(store.fields[s : s + t_in] - mean) / std for s in starts]
    )  # (B, T_in, 6, n, n, C)
    t0s = store.times[starts + t_in - 1]

    constants = None
    if store.constants is not None and len(dcfg.constants):
        names = list(store.constant_names)
        idx = [names.index(c) for c in dcfg.constants]
        constants = store.constants[..., idx]

    est = TimeSeriesEstimator(
        apply_fn=model.apply,
        params=state.params,
        data_cfg=dcfg,
        lat=lat,
        lon=lon,
        constants=constants,
        insol_mean=stats["insol_mean"],
        insol_std=stats["insol_std"],
    )
    # one batched rollout over all initializations, each with insolation at
    # its OWN init time (a per-member (B,) t0 vector).  t0s stay float64:
    # predict reduces them mod the insolation period BEFORE the f32 cast —
    # pre-casting would quantize the forcing clock to ~84 s.
    import jax.numpy as jnp

    fc = est.predict(
        jnp.asarray(windows), np.asarray(t0s, np.float64), steps=calls
    )
    fields = np.asarray(fc.fields) * std + mean  # de-normalize
    np.savez(
        workdir / "forecast.npz",
        fields=fields,
        lead_hours=np.asarray(fc.lead_hours),
        init_times=t0s,
        variables=np.array(store.variables, dtype=object),
    )
    print(
        f"forecast: {fields.shape} (B, leads, 6, n, n, C) to "
        f"{float(fc.lead_hours[-1]) / 24:.1f} days -> {workdir / 'forecast.npz'}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
