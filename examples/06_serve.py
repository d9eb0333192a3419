"""Example 6: production forecast serving.

Loads the trained model from example 02 and serves batched autoregressive
forecasts over HTTP (npz request/response — see dlwp_cs_tpu/serve).  The
reference has no serving story (inference is a notebook loop, SURVEY.md
§3.3); this is the deployment-shaped entry point of the TPU rebuild.

Usage:
  python examples/06_serve.py --workdir /tmp/dlwp --port 8800
      (blocks; POST npz {window, t0_days, steps} to /forecast)
  python examples/06_serve.py --workdir /tmp/dlwp --selftest
      (starts the server on an ephemeral port, sends concurrent client
       requests from the store's last windows, prints a summary, exits)
  python examples/06_serve.py --workdir /tmp/dlwp --artifact
      (serves from the AOT StableHLO artifact written by example 07 —
       rollout_artifact/ — with NO model objects in the process; steps is
       fixed by the artifact)
"""

from __future__ import annotations

import argparse
import threading
from pathlib import Path

import numpy as np

from dlwp_cs_tpu.data import open_store
from dlwp_cs_tpu.estimator import DLWPEstimator
from dlwp_cs_tpu.serve import ForecastHTTPServer, ForecastService, forecast_request


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--port", type=int, default=8800)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--selftest", action="store_true")
    ap.add_argument("--artifact", action="store_true",
                    help="serve the AOT artifact (example 07) instead of "
                         "the live estimator; steps is fixed by the artifact")
    args = ap.parse_args()
    workdir = Path(args.workdir)

    if args.artifact:
        from dlwp_cs_tpu.serve import ExportedForecastService

        # artifact-only deployment: no store or model objects needed to
        # serve (the store below is opened only for selftest windows)
        svc = ExportedForecastService(workdir / "rollout_artifact",
                                      max_wait_ms=50.0)
        args.steps = svc.steps
        t_in = svc.info()["input_time_steps"]
    else:
        store = open_store(workdir / "predictors_cs.h5")
        est = DLWPEstimator.load(workdir / "model")
        svc = ForecastService(est, constants_store=store, max_wait_ms=50.0)
        t_in = est.config.data.input_time_steps

    if not args.selftest:
        from dlwp_cs_tpu.serve import serve_forever

        serve_forever(svc, host=args.host, port=args.port)
        return 0

    if args.artifact:
        store = open_store(workdir / "predictors_cs.h5")  # windows only
    srv = ForecastHTTPServer(svc, host="127.0.0.1", port=0).start()
    print(f"[serve] selftest on port {srv.port}")
    idx = [len(store.times) - 3, len(store.times) - 2, len(store.times) - 1]
    results: dict[int, tuple] = {}

    def call(i):
        window = np.asarray(store.fields[i - t_in + 1 : i + 1])
        results[i] = forecast_request(
            "127.0.0.1", srv.port, window, float(store.times[i]), args.steps
        )

    threads = [threading.Thread(target=call, args=(i,)) for i in idx]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)

    st = svc.stats
    ok = True
    for i in idx:
        if i not in results:
            print(f"[serve] request {i}: MISSING")
            ok = False
            continue
        fields, lead, _ = results[i]
        finite = bool(np.isfinite(fields).all())
        ok &= finite
        print(
            f"[serve] init t={store.times[i]:.2f}d -> fields {fields.shape}, "
            f"lead {lead[0]:.0f}..{lead[-1]:.0f} h, finite={finite}"
        )
    print(
        f"[serve] stats: requests={st.requests} batches={st.batches} "
        f"mean_batch={st.mean_batch:.2f} device_s={st.device_seconds:.2f}"
    )
    srv.stop()
    print("selftest ok" if ok else "selftest FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
