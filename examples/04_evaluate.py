"""Example 4: verification of saved forecasts.

Workflow parity with the reference's evaluate scripts + ``DLWP/verify.py``
(SURVEY.md §3.5): per-lead RMSE + ACC against the held-out truth, compared to
persistence and climatology baselines; error curves and face-map plots; the
lat-lon map panel uses the inverse remap.

Usage:
  python examples/04_evaluate.py --workdir /tmp/dlwp
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from dlwp_cs_tpu.data import open_store
from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.plot import plot_cube_faces, plot_error_curves
from dlwp_cs_tpu.verify import acc_curve, climo_error, forecast_error, persistence_error


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--variable", default=None, help="variable to plot (default: first)")
    args = ap.parse_args()
    workdir = Path(args.workdir)

    fz = np.load(workdir / "forecast.npz", allow_pickle=True)
    fields, lead_hours, init_times = fz["fields"], fz["lead_hours"], fz["init_times"]
    variables = list(fz["variables"])
    store = open_store(workdir / "predictors_cs.h5").load()
    n = store.grid_n
    cs = CubedSphere(n)

    # Align truth with the forecast (B, L) structure.
    from dlwp_cs_tpu.verify import align_truth

    aligned = align_truth(store, init_times, lead_hours)
    truth = aligned["truth"]
    init_fields = aligned["init_fields"]
    lead_hours = aligned["lead_hours"]
    fields = fields[:, aligned["kept"]]

    climo = store.fields.mean(axis=0)
    w = cs.area_weights
    # all curves PER CHANNEL: an all-channel mix is dominated by whichever
    # variable has the largest physical scale, making the model-vs-baseline
    # comparison meaningless for the others
    rmse = forecast_error(fields, truth, "rmse", weights=w, keep_channels=True)
    pers = persistence_error(init_fields, truth, weights=w, keep_channels=True)
    clim = climo_error(climo, truth, weights=w, keep_channels=True)
    acc = acc_curve(fields, truth, climo, weights=w, keep_channels=True)

    vi = variables.index(args.variable) if args.variable else 0
    pers, clim, acc = pers[:, vi], clim[:, vi], acc[:, vi]
    curves = {
        f"model ({variables[vi]})": rmse[:, vi],
        "persistence": pers,
        "climatology": clim,
    }
    plot_error_curves(
        lead_hours, curves, title="RMSE vs lead time",
        out_path=workdir / "rmse_curves.png",
    )
    plot_cube_faces(
        fields[0, -1, ..., vi],
        title=f"{variables[vi]} forecast, +{lead_hours[-1] / 24:.1f} d",
        out_path=workdir / "forecast_map.png",
    )
    print("lead(h)  RMSE(model)  RMSE(pers)  RMSE(climo)  ACC")
    for li in range(len(lead_hours)):
        print(
            f"{lead_hours[li]:7.0f}  {rmse[li, vi]:11.4f}  {pers[li]:10.4f}  "
            f"{clim[li]:11.4f}  {acc[li]:5.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
