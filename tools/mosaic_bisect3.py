"""Probe dw formulations: leading-collapse reshape vs batched dot."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dt = jnp.bfloat16

def try_compile(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:160]}", flush=True)

for n, C, D in [(48, 32, 64), (24, 64, 64), (12, 128, 128)]:
    x = jnp.zeros((n, n, C), dt)
    g = jnp.zeros((n, n, D), dt)
    def k1(x_ref, g_ref, o_ref):
        a = x_ref[:].reshape(n * n, C)
        b = g_ref[:].reshape(n * n, D)
        o_ref[:] = jax.lax.dot_general(a, b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    f1 = lambda x, g: pl.pallas_call(k1,
        out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, g)
    try_compile(f"reshape-collapse n={n}", f1, x, g)

    def k2(x_ref, g_ref, o_ref):
        # batch over the width dim, contract rows -> (n, C, D), reduce
        bd = jax.lax.dot_general(x_ref[:], g_ref[:],
            dimension_numbers=(((0,), (0,)), ((1,), (1,))),
            preferred_element_type=jnp.float32)
        o_ref[:] = jnp.sum(bd, axis=0)
    f2 = lambda x, g: pl.pallas_call(k2,
        out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, g)
    try_compile(f"batched-dot n={n}", f2, x, g)
