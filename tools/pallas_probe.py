"""TPU probe: compile + time the fused Pallas conv vs ring-fix (bf16/f32).

Chained-scan methodology; run ON TPU from repo root.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.ops import cs_conv
from dlwp_cs_tpu.ops.pallas_conv import cs_conv3x3_pallas

N, CIN, COUT, B, CHAIN = 48, 64, 64, 16, 30


def main():
    rng = np.random.default_rng(0)
    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(rng.normal(size=(B, 6, N, N, CIN)).astype(np.float32)).astype(dtype)
        ke = (jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)).astype(np.float32)) * 0.1).astype(dtype)
        kp = (jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)).astype(np.float32)) * 0.1).astype(dtype)
        zb = jnp.zeros((COUT,), dtype)

        def chain(f):
            @jax.jit
            def run(x):
                def body(c, _):
                    out = f(x + c)
                    return jnp.mean(out).astype(x.dtype), None
                c, _ = lax.scan(body, jnp.zeros((), x.dtype), None, length=CHAIN)
                return c
            return run

        results = {}
        for name, f in [
            ("pallas", lambda v: cs_conv3x3_pallas(v, ke, kp, zb, zb, False)),
            ("ringfix", lambda v: cs_conv(v, ke, kp, backend="ringfix")),
            ("same", lambda v: cs_conv(v, ke, kp, backend="same")),
        ]:
            run = chain(f)
            try:
                t0 = time.perf_counter()
                float(run(x))
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(run(x))
                    best = min(best, time.perf_counter() - t0)
                per = best / CHAIN * 1e6
                results[name] = per
                print(f"{dtype.__name__} {name:8s}: {per:8.1f} us/conv (compile {compile_s:.0f}s)", flush=True)
            except Exception as e:
                print(f"{dtype.__name__} {name:8s}: FAILED: {str(e)[:300]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
