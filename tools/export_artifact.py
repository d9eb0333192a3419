"""Re-export an AOT serving artifact from an existing checkpoint.

Turns any ``DLWPEstimator.save`` checkpoint directory into a standalone
StableHLO artifact (``dlwp_cs_tpu.serve.export``) without retraining or a
running service — the deployment-side half of the reference's
``save_model``/``load_model`` round trip (SURVEY.md §3.4), producing the
code-free format instead of a pickle.

Usage::

    python tools/export_artifact.py --checkpoint /path/ckpt --out /path/art \
        --steps 8,56 [--batch-sizes 1,8] [--constants-store predictors.h5] \
        [--platforms tpu,cpu]

Several ``--steps`` values share one artifact; the serving layer picks the
right executable per request (serve/export.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True,
                    help="DLWPEstimator.save directory")
    ap.add_argument("--out", required=True, help="artifact directory to write")
    ap.add_argument("--steps", required=True,
                    help="comma-separated rollout lengths, e.g. 8,56")
    ap.add_argument("--batch-sizes", default="1",
                    help="comma-separated window batch buckets (default 1)")
    ap.add_argument("--constants-store", default=None,
                    help="predictor store with the model's constant channels "
                         "(required when the model uses constants)")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms, e.g. tpu,cpu "
                         "(default: current backend)")
    args = ap.parse_args()

    from dlwp_cs_tpu.estimator import DLWPEstimator
    from dlwp_cs_tpu.serve import export_forecaster

    est = DLWPEstimator.load(Path(args.checkpoint))
    store = None
    if args.constants_store is not None:
        from dlwp_cs_tpu.data import open_store

        store = open_store(args.constants_store)
    steps = [int(s) for s in args.steps.split(",")]
    target = export_forecaster(
        est,
        args.out,
        steps=steps,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        constants_store=store,
        platforms=(None if args.platforms is None
                   else args.platforms.split(",")),
    )
    n_bins = len(list(target.glob("rollout_*.bin")))
    print(f"[export] wrote {target} (steps={steps}, {n_bins} executables)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
