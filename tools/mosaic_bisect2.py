"""Bisect A: which ghost write fails bf16 — rows, cols, or variants."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C = 48, 64
dt = jnp.bfloat16

def try_compile(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:160]}", flush=True)

x = jnp.zeros((N, N, C), dt)
ext = jnp.zeros((4, N + 2, C), dt)

def mk(body):
    def k(x_ref, e_ref, o_ref, xpad):
        xpad[1:N+1, 1:N+1, :] = x_ref[:]
        body(e_ref, xpad)
        o_ref[:] = xpad[1:N+1, 2:N+2, :]
    return lambda x, e: pl.pallas_call(k,
        out_shape=jax.ShapeDtypeStruct((N, N, C), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N+2, N+2, C), dt)])(x, e)

try_compile("rows-int-idx", mk(lambda e, xpad: (
    xpad.__setitem__((0, slice(None), slice(None)), e[0]),
    xpad.__setitem__((N+1, slice(None), slice(None)), e[1]))), x, ext)
try_compile("rows-slice-idx", mk(lambda e, xpad: (
    xpad.__setitem__((slice(0,1),), e[0:1]),
    xpad.__setitem__((slice(N+1,N+2),), e[1:2]))), x, ext)
try_compile("col-int-idx", mk(lambda e, xpad:
    xpad.__setitem__((slice(None), 0, slice(None)), e[2])), x, ext)
try_compile("col-newaxis", mk(lambda e, xpad:
    xpad.__setitem__((slice(None), slice(0,1), slice(None)), e[2][:, None, :])), x, ext)
# col via loop of row-scalar writes? too slow. col via where-free: skip
