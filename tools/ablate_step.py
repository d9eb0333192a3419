"""Perf ablation of the flagship train step: where do the milliseconds go?

Default run (chained-scan methodology, PERF.md) measures TWO backends:
  fwd+bwd x {auto, same-conv-only}    -> cost of the halo machinery
  fwd-only x {auto, same-conv-only}   -> fwd/bwd split
where ``auto`` is the production dispatch (packed Pallas forward + XLA
composition backward) and ``same`` is the numerically-wrong halo-free lower
bound.  All at the bench configuration (C48, (32,64,128), b=16, bf16).

Extra rows are opt-in (each costs minutes of remote compile):
  ``--backends``  adds the pallas / ringfix backends and the +packbase A/B;
  ``--all``       additionally adds the measured-dead pallas backward modes
                  ("hybrid", "fused" — PERF.md).

Run ON TPU: ``python tools/ablate_step.py [--backends|--all]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
from dlwp_cs_tpu.ops import mse
from dlwp_cs_tpu.train import init_state, make_optimizer, make_train_step

N, FILTERS, BATCH, CHAIN, REPEATS = 48, (32, 64, 128), 16, 20, 5


def main() -> int:
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
        _wall(lambda: float(trivial(jnp.zeros(())))) for _ in range(5)
    )

    def model_for(backend):
        mcfg = UNetConfig(
            output_channels=dcfg.output_channels,
            filters=FILTERS,
            compute_dtype="bfloat16",
            conv_backend=backend,
        )
        model = CubeSphereUNet(mcfg)
        params = model.init(jax.random.PRNGKey(0), x)
        return model, params

    def time_chain(run, init):
        out = run(init)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = run(init)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return max((best - t_over) / CHAIN, 1e-9)

    from dlwp_cs_tpu.ops.pallas_conv import use_pallas_backward

    results = {}
    # Default to the two rows that answer "where do the milliseconds go"
    # (full default path vs halo-free bound); each extra variant costs
    # minutes of remote compile in this environment, so the rest is opt-in.
    variants = [(b, "xla") for b in ("auto", "same")]
    if "--backends" in sys.argv or "--all" in sys.argv:
        variants += [(b, "xla") for b in ("pallas", "ringfix")]
        variants += [("auto", "xla+packbase")]
    if "--packoff" in sys.argv:
        # A/B the packed-resident model against forced-unpacked variants:
        # tools/bwd_micro.py's corrected timing shows XLA's UNPACKED SAME
        # conv beats the block-diag packed conv at the outer levels, so the
        # model-level packing may be a net pessimization on the XLA paths.
        variants += [("auto", "xla+packoff"), ("ringfix", "xla+packoff")]
    if "--xring" in sys.argv:
        # XLA SAME conv + Pallas ring kernel (ops.ring_kernel); the model
        # stays unpacked by construction (the pack gate excludes 'xring')
        variants += [("xring", "xla")]
    if "--all" in sys.argv:
        # measured-dead backward modes (PERF.md): compile-expensive, opt-in
        variants += [("pallas", "hybrid"), ("pallas", "fused")]
    for backend, bwd in variants:
        model, params = model_for(backend)
        opt = make_optimizer(TrainConfig(learning_rate=1e-3))
        step = make_train_step(model.apply, opt, mse, jit=False)

        def run_train_fn(state, step=step, bwd=bwd):
            from dlwp_cs_tpu.ops.ringfix import use_packed_base

            def body(s, _):
                s, m = step(s, x, y)
                return s, m["loss"]

            # None = AUTO (the production default); the +packbase tag
            # forces True, +packoff forces False (unpacked model A/B)
            packbase = None
            if bwd.endswith("+packbase"):
                packbase = True
            elif bwd.endswith("+packoff"):
                packbase = False
            bwd_mode = bwd.replace("+packbase", "").replace("+packoff", "")
            with use_pallas_backward(bwd_mode), use_packed_base(packbase):
                _, losses = lax.scan(body, state, None, length=CHAIN)
            return losses[-1]

        run_train = jax.jit(run_train_fn)
        state = init_state(params, opt)
        tag = backend if bwd == "xla" else f"{backend}+{bwd}"
        results[f"train/{tag}"] = time_chain(run_train, state)
        if bwd not in ("xla", "xla+packoff"):
            continue
        fwd_packbase = False if bwd.endswith("+packoff") else None

        @jax.jit
        def run_fwd(params, model=model, packbase=fwd_packbase):
            from dlwp_cs_tpu.ops.ringfix import use_packed_base

            def body(c, _):
                with use_packed_base(packbase):
                    out = model.apply(params, x + c)
                return jnp.mean(out), None

            c, _ = lax.scan(body, jnp.zeros((), x.dtype), None, length=CHAIN)
            return c

        results[f"fwd/{tag}"] = time_chain(run_fwd, params)

    print(f"platform={jax.devices()[0].platform} overhead={t_over * 1e3:.1f}ms")
    for k, v in results.items():
        print(f"{k:16s} {v * 1e3:8.2f} ms/step")
    tr, ts = results["train/auto"], results["train/same"]
    fr, fs = results["fwd/auto"], results["fwd/same"]
    print(f"halo cost: fwd {1e3 * (fr - fs):.2f} ms, train {1e3 * (tr - ts):.2f} ms")
    print(f"bwd+opt cost: ringfix {1e3 * (tr - fr):.2f} ms, same {1e3 * (ts - fs):.2f} ms")
    return 0


def _wall(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _sync(out):
    jax.tree.map(
        lambda a: float(np.asarray(a).reshape(-1)[0]), out
    )


if __name__ == "__main__":
    sys.exit(main())
