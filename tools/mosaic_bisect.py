"""Bisect which kernel op pattern fails Mosaic bf16 lowering."""
import sys, functools
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C, D = 48, 64, 64
dt = jnp.bfloat16

def try_compile(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:200]}", flush=True)

x = jnp.zeros((N, N, C), dt)
ext = jnp.zeros((4, N + 2, C), dt)
k2 = jnp.zeros((C, D), dt)
k4 = jnp.zeros((3, 3, C, D), dt)

# A: scratch assembly with offset writes
def kA(x_ref, e_ref, o_ref, xpad):
    n = N
    xpad[1:n+1, 1:n+1, :] = x_ref[:]
    xpad[0, :, :] = e_ref[0]
    xpad[n+1, :, :] = e_ref[1]
    xpad[:, 0, :] = e_ref[2]
    xpad[:, n+1, :] = e_ref[3]
    o_ref[:] = xpad[1:n+1, 2:n+2, :]
fA = lambda x, e: pl.pallas_call(kA,
    out_shape=jax.ShapeDtypeStruct((N, N, C), dt),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((N+2, N+2, C), dt)])(x, e)
try_compile("A-assembly", fA, x, ext)

# B: where-select of 2D bf16 weights by scalar
def kB(k1_ref, k2_ref, o_ref):
    s = pl.program_id(0)
    k = jnp.where(s < 4, k1_ref[1, 1], k2_ref[1, 1])
    o_ref[0] = k
fB = lambda a, b: pl.pallas_call(kB, grid=(2,),
    out_shape=jax.ShapeDtypeStruct((2, C, D), dt),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec((1, C, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))(a, b)
try_compile("B-select", fB, k4, k4)

# C: 3D x 2D dot_general bf16 -> f32
def kC(x_ref, k_ref, o_ref):
    acc = jax.lax.dot_general(x_ref[:], k_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(dt)
fC = lambda x, k: pl.pallas_call(kC,
    out_shape=jax.ShapeDtypeStruct((N, N, D), dt),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, k)
try_compile("C-dot", fC, x, k2)

# D: shifted reads from scratch + dot (no ghost writes)
def kD(x_ref, k_ref, o_ref, xpad):
    n = N
    xpad[1:n+1, 1:n+1, :] = x_ref[:]
    acc = jnp.zeros((n, n, D), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc += jax.lax.dot_general(xpad[dy:dy+n, dx:dx+n, :], k_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(dt)
fD = lambda x, k: pl.pallas_call(kD,
    out_shape=jax.ShapeDtypeStruct((N, N, D), dt),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((N+2, N+2, C), dt)])(x, k)
try_compile("D-shifted-dots", fD, x, k4)

# E: bias add of (1, D) bf16
b1 = jnp.zeros((1, D), dt)
def kE(x_ref, b_ref, o_ref):
    acc = x_ref[:].astype(jnp.float32) + b_ref[:][None].astype(jnp.float32)
    o_ref[:] = acc.astype(dt)
fE = lambda x, b: pl.pallas_call(kE,
    out_shape=jax.ShapeDtypeStruct((N, N, D), dt),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.zeros((N,N,D),dt), b)
try_compile("E-bias", fE, x, b1)
