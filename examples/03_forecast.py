"""Example 3: autoregressive forecasts from a trained model.

Workflow parity with the reference's predict scripts + TimeSeriesEstimator
(SURVEY.md §3.3), except the whole rollout is one on-device lax.scan.

Uses the same ``DLWPEstimator.load`` facade as the serving examples (06/07)
so the restore path cannot drift from production; the low-level
``TimeSeriesEstimator`` API it wraps is exercised directly in
tests/test_train_rollout.py.

Usage:
  python examples/03_forecast.py --workdir /tmp/dlwp [--days 14]
      [--inits 4] (forecasts start from the last windows of the store)
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from dlwp_cs_tpu.data import open_store
from dlwp_cs_tpu.estimator import DLWPEstimator


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--days", type=float, default=14.0)
    ap.add_argument("--inits", type=int, default=4)
    args = ap.parse_args()
    workdir = Path(args.workdir)

    est = DLWPEstimator.load(workdir / "model")
    dcfg = est.config.data
    store = open_store(workdir / "predictors_cs.h5").load()

    mean = np.asarray(est.stats["mean"], np.float32)
    std = np.asarray(est.stats["std"], np.float32)
    t_in = dcfg.input_time_steps
    calls = int(round(args.days * 24 / (dcfg.step_hours * dcfg.output_time_steps)))

    # Initializations from the held-out tail, leaving enough samples after
    # each init so example 04 has verifying truth at every lead.
    n_leads = calls * dcfg.output_time_steps
    last_start = store.fields.shape[0] - t_in - n_leads
    if last_start < args.inits - 1:
        raise SystemExit(
            f"store too short: need {t_in + n_leads + args.inits - 1} samples, "
            f"have {store.fields.shape[0]} — reduce --days or --inits"
        )
    starts = np.arange(args.inits) + (last_start - args.inits + 1)
    init_indices = starts + t_in - 1  # index of each window's LAST input time

    # one batched rollout over all initializations, each with insolation at
    # its OWN init time (forecast passes per-member float64 t0s; predict
    # reduces them mod the insolation period BEFORE the f32 cast)
    fc = est.forecast(store, init_indices=init_indices, steps=calls)
    fields = np.asarray(fc.fields) * std + mean  # de-normalize
    t0s = np.asarray(store.times)[init_indices]
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
