"""Example 7: ensemble forecasting + AOT export.

Two production capabilities the reference never had (its ensemble papers
looped the notebook estimator per member; its only persistence was
pickle+h5, SURVEY.md §3.3-3.4):

1. a perturbed-IC ensemble forecast as ONE device dispatch (members folded
   into the batch axis), scored with CRPS / spread-error against the held-
   out truth in the predictor store;
2. an AOT StableHLO artifact of the whole rollout (weights baked in) that
   reloads WITHOUT model code and agrees with the live service to tight
   numerical tolerance (<1e-4 raw units here; bitwise only when export and
   serving lower the same conv path on the same platform — a CPU-exported
   artifact takes the portable XLA path, not the TPU Pallas kernel).

Usage:
  python examples/07_ensemble_export.py --workdir /tmp/dlwp \
      [--members 8] [--steps 8] [--amplitude 0.05]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from dlwp_cs_tpu.data import open_store
from dlwp_cs_tpu.estimator import DLWPEstimator
from dlwp_cs_tpu.serve import ExportedForecaster, ForecastService, export_forecaster
from dlwp_cs_tpu.verify import crps_ensemble, spread_error


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--amplitude", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    workdir = Path(args.workdir)

    store = open_store(workdir / "predictors_cs.h5")
    est = DLWPEstimator.load(workdir / "model")
    svc = ForecastService(est, constants_store=store)
    dcfg = est.config.data
    t_in = dcfg.input_time_steps
    t_out = dcfg.output_time_steps
    n_lead = args.steps * t_out

    # init at the last index that leaves n_lead verification times
    i0 = len(store.times) - 1 - n_lead
    if i0 < t_in - 1:
        raise SystemExit("store too short for the requested steps")
    window = np.asarray(store.fields[i0 - t_in + 1 : i0 + 1])
    t0 = float(store.times[i0])

    # --- 1. ensemble forecast + probabilistic scores ------------------------
    import jax

    ens = svc.forecast_ensemble(
        window, t0, steps=args.steps, members=args.members,
        amplitude=args.amplitude, key=jax.random.PRNGKey(args.seed),
        keep_members=True,
    )
    truth = np.asarray(store.fields[i0 + 1 : i0 + 1 + n_lead])  # (L, 6,n,n,C)
    truth = truth[None]  # (B=1, L, ...)
    crps = np.asarray(
        crps_ensemble(np.asarray(ens.members), truth)
    ).mean(axis=(0, 2, 3, 4, 5))
    rmse, spread = spread_error(np.asarray(ens.members), truth)
    rmse, spread = np.asarray(rmse), np.asarray(spread)
    print(f"[ensemble] {args.members} members, amplitude {args.amplitude}")
    for li in range(0, n_lead, max(1, n_lead // 4)):
        print(
            f"[ensemble] lead {float(ens.lead_hours[li]):5.0f} h: "
            f"crps={crps[li]:.4f} rmse(mean)={rmse[li]:.4f} "
            f"spread={spread[li]:.4f}"
        )

    # --- 2. AOT export round trip -------------------------------------------
    artifact = workdir / "rollout_artifact"
    export_forecaster(
        est, artifact, steps=args.steps, batch_sizes=(1,),
        constants_store=store,
    )
    exp = ExportedForecaster.load(artifact)
    live = svc.forecast(window, t0, steps=args.steps)
    aot = exp.forecast(window, t0)
    diff = float(np.max(np.abs(np.asarray(aot.fields) - np.asarray(live.fields))))
    size_kb = sum(
        f.stat().st_size for f in artifact.iterdir()
    ) / 1024.0
    print(
        f"[export] artifact {artifact.name}: {size_kb:.0f} KiB, "
        f"AOT vs live maxdiff {diff:.2e}"
    )
    ok = bool(np.isfinite(ens.mean).all()) and diff < 1e-4
    print("ensemble+export ok" if ok else "ensemble+export FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
