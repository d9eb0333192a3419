"""XLA:TPU flag sweep on the flagship train step.

The formulation-level space is mined out (PERF.md round 3); this probes the
COMPILER-level knobs XLA exposes, one subprocess per flag set (XLA_FLAGS
bind at backend init).  Each worker times the production train step with
the chained-scan methodology (CHAIN=20, best-of-5, dispatch overhead
subtracted) and prints one JSON line; the parent collates a table.

Usage: python tools/xla_flags_sweep.py            # sweep (minutes: one
                                                  # remote compile per set)
       python tools/xla_flags_sweep.py --worker   # internal

MEASURED RESULT (2026-08-20, v5e via the axon remote-compile tunnel):
every ``--xla_tpu_*`` flag is rejected with "Unknown flag in XLA_FLAGS" —
those flags are defined by libtpu, which is not loaded in-process here (the
tunnel compiles remotely), so TPU compiler-flag tuning is unavailable in
this environment.  Baseline row: 10.951 ms step.  The tool stays for
environments with a local libtpu.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# candidate sets: scoped-VMEM (fusion scratch budget) is the main
# single-chip lever; the rest probe scheduling/hoisting defaults
FLAG_SETS = {
    "baseline": "",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "no_lhs": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "licm10": "--xla_tpu_licm_size_inflation_ratio=10",
}


def worker() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
    from dlwp_cs_tpu.ops import mse
    from dlwp_cs_tpu.train import init_state, make_optimizer, make_train_step

    N, FILTERS, BATCH, CHAIN, REPEATS = 48, (32, 64, 128), 16, 20, 5
    dcfg = DataConfig(grid_n=N)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(BATCH, 6, N, N, dcfg.input_channels)).astype(np.float32)
    )
    y = jnp.asarray(
        rng.normal(size=(BATCH, 6, N, N, dcfg.output_channels)).astype(np.float32)
    )
    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.zeros(())))
    t_over = min(
        (lambda t0: (float(trivial(jnp.zeros(()))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(5)
    )
    mcfg = UNetConfig(
        output_channels=dcfg.output_channels,
        filters=FILTERS,
        compute_dtype="bfloat16",
    )
    model = CubeSphereUNet(mcfg)
    params = model.init(jax.random.PRNGKey(0), x)
    opt = make_optimizer(TrainConfig(learning_rate=1e-3))
    step = make_train_step(model.apply, opt, mse, jit=False)

    @jax.jit
    def run(state):
        def body(s, _):
            s, m = step(s, x, y)
            return s, m["loss"]

        _, losses = lax.scan(body, state, None, length=CHAIN)
        return losses[-1]

    state = init_state(params, opt)
    float(run(state))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(state))
        best = min(best, time.perf_counter() - t0)
    step_ms = max(best - t_over, 0.0) / CHAIN * 1e3
    print(json.dumps({"step_ms": round(step_ms, 3),
                      "overhead_ms": round(t_over * 1e3, 1)}))
    return 0


def main() -> int:
    if "--worker" in sys.argv:
        return worker()
    rows = {}
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, __file__, "--worker"],
            capture_output=True, text=True, env=env, timeout=900,
        )
        out = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode != 0 or not out:
            err = (proc.stderr or "").strip().splitlines()
            rows[name] = {"error": err[-1][:120] if err else "no output"}
        else:
            rows[name] = json.loads(out[-1])
        rows[name]["wall_s"] = round(time.time() - t0, 1)
        print(f"{name:10s} {flags or '(none)':50s} -> {rows[name]}",
              file=sys.stderr, flush=True)
    print(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
