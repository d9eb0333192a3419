"""Pallas fused halo-pad + cubed-sphere convolution (TPU kernel path).

The XLA path (:mod:`dlwp_cs_tpu.ops.conv`) materializes the halo-padded
activation tensor in HBM between pad and conv — roughly one extra full
read+write of the activations per convolution, which dominates at DLWP-CS
scales where convs are HBM-bandwidth-bound.  This kernel fuses the exchange
into the convolution: each face's padded tile is assembled in VMEM scratch,
and the 3x3 conv is computed as 9 shifted ``(n, n, Cin) x (Cin, Cout)`` MXU
contractions accumulated in f32.

Split of labor (Mosaic cannot lower ``rev``/transpose reorientations):

* the 24 *oriented* depth-1 edge strips — a tiny ``(B, 6, 4, n, C)`` tensor,
  ~n/6 of one activation row per face — are computed OUTSIDE the kernel with
  ordinary XLA ops (:func:`gather_halo_strips`), using the same
  numerically-verified edge table as everything else;
* the kernel consumes ``x`` + strips, assembles each padded face in VMEM
  (interior copy + 4 strip rows + 4 corner averages) and runs the 9-tap MXU
  accumulation.  The O(n^2) padded tensor never exists in HBM.

Scope: kernel_size (3,3), stride 1, dilation 1 — the hot configuration of
every DLWP-CS conv layer; other configurations take the XLA path (dispatch
in ``ops.conv``).  Backward runs through the XLA composition's VJP (the op
is linear, so XLA DCEs the unused primal); a fused backward kernel is the
next optimization.

Reference parity: CubeSpherePadding2D + CubeSphereConv2D fused
(``DLWP/custom.py`` — SURVEY.md §2 rows 1-2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlwp_cs_tpu.geometry.cubed_sphere import EDGE_E, EDGE_N, EDGE_S, EDGE_W
from dlwp_cs_tpu.ops.padding import padding_plan

__all__ = [
    "cs_conv3x3_pallas",
    "gather_halo_strips",
    "pallas_supported",
    "vmem_estimate_bytes",
]


@functools.lru_cache(maxsize=32)
def _strip_gather_indices(n: int) -> "np.ndarray":
    """Flat cell indices (into 6*n*n) of all 24 oriented ghost strips.

    Shape (6, 4, n): entry [f, e, t] is the source cell whose value becomes
    the ghost beyond edge ``e`` of face ``f`` at along-edge position ``t``.
    Derived from the verified edge table; turns halo-strip extraction into a
    single gather (24 separate thin slices were a measured TPU cost).
    """
    import numpy as np

    table = padding_plan(n, 1).table
    idx = np.empty((6, 4, n), np.int32)
    t = np.arange(n)
    for f in range(6):
        for e in range(4):
            link = table[f][e]
            g, e2 = link.face, link.edge
            tt = t[::-1] if link.reverse else t
            if e2 == EDGE_S:
                i, j = np.zeros(n, np.int64), tt
            elif e2 == EDGE_N:
                i, j = np.full(n, n - 1), tt
            elif e2 == EDGE_W:
                i, j = tt, np.zeros(n, np.int64)
            else:
                i, j = tt, np.full(n, n - 1)
            idx[f, e] = g * n * n + i * n + j
    return idx


def gather_halo_strips(x):
    """Oriented depth-1 ghost strips for every (face, edge).

    ``x``: ``(B, 6, n, n, C)`` -> ``(B, 6, 4, n, C)`` where ``[b, f, e, t]``
    is the ghost value beyond edge ``e`` of face ``f`` at along-edge position
    ``t`` (already reversed where the seam demands it).  One gather op.
    """
    b, _, n, _, c = x.shape
    idx = jnp.asarray(_strip_gather_indices(n).reshape(-1))
    flat = x.reshape(b, 6 * n * n, c)
    return jnp.take(flat, idx, axis=1).reshape(b, 6, 4, n, c)


def _kernel(x_ref, strip_ref, keq_ref, kpo_ref, beq_ref, bpo_ref, out_ref, xpad, *, n):
    """One (batch, face) block: assemble the padded face in VMEM, convolve.

    Gridding over faces (not just batch) keeps the per-step VMEM footprint
    to one face + its strips (Mosaic double-buffers the pipelined blocks, so
    whole-sphere blocks blow the 16 MB budget at C48) and lets the DMA of
    face f+1 overlap the MXU work on face f.
    """
    cout = out_ref.shape[-1]
    f = pl.program_id(1)
    is_equatorial = f < 4
    # ---- padded face (n+2, n+2, Cin) in VMEM scratch ---------------------
    s_strip = strip_ref[0, 0, EDGE_S]  # (n, C)
    n_strip = strip_ref[0, 0, EDGE_N]
    w_strip = strip_ref[0, 0, EDGE_W]
    e_strip = strip_ref[0, 0, EDGE_E]
    xpad[1 : n + 1, 1 : n + 1, :] = x_ref[0, 0]
    xpad[0, 1 : n + 1, :] = s_strip
    xpad[n + 1, 1 : n + 1, :] = n_strip
    xpad[1 : n + 1, 0, :] = w_strip
    xpad[1 : n + 1, n + 1, :] = e_strip
    # corners: average of the two flanking edge ghosts
    xpad[0, 0, :] = 0.5 * (s_strip[0] + w_strip[0])
    xpad[0, n + 1, :] = 0.5 * (s_strip[n - 1] + e_strip[0])
    xpad[n + 1, 0, :] = 0.5 * (n_strip[0] + w_strip[n - 1])
    xpad[n + 1, n + 1, :] = 0.5 * (n_strip[n - 1] + e_strip[n - 1])
    # ---- 9-tap shifted contractions on the MXU ---------------------------
    # Weight-group choice is data-dependent on the face id: load both small
    # kernels and select elementwise (cheap vs. the matmuls).
    acc = jnp.zeros((n, n, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            k = jnp.where(is_equatorial, keq_ref[dy, dx], kpo_ref[dy, dx])
            tile = xpad[dy : dy + n, dx : dx + n, :]  # (n, n, Cin)
            acc += jax.lax.dot_general(
                tile,
                k,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    bias = jnp.where(is_equatorial, beq_ref[0], bpo_ref[0])
    acc += bias.astype(jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def vmem_estimate_bytes(n: int, cin: int, cout: int, dtype_bytes: int = 4) -> int:
    """Rough VMEM footprint of the fused kernel for feasibility gating.

    Per grid step the kernel holds ONE face block (+ strips) and its output;
    Mosaic double-buffers the pipelined in/out blocks (x2 below).
    """
    x = 2 * n * n * cin * dtype_bytes
    strips = 2 * 4 * n * cin * dtype_bytes
    out = 2 * n * n * cout * dtype_bytes
    pad = (n + 2) * (n + 2) * cin * dtype_bytes
    acc = n * n * cout * 4
    k = 2 * 9 * cin * cout * dtype_bytes
    return x + strips + out + pad + acc + k


def pallas_supported(x_shape, kernel_size, stride, dilation, dtype) -> bool:
    """Is the fused kernel applicable (and likely to fit VMEM)?

    bf16 is currently routed to the XLA path: Mosaic cannot lower the
    kernel's sub-tile shape casts for 16-bit types with non-128 lane dims
    ("infer-vector-layout: unsupported shape cast"); a lane-aligned bf16
    kernel (channels padded to 128) is the next kernel milestone.
    """
    if tuple(kernel_size) != (3, 3) or stride != 1 or dilation != 1:
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    n = x_shape[-2]
    if x_shape[-3] != n or n < 4:
        return False
    dtype_bytes = jnp.dtype(dtype).itemsize
    return vmem_estimate_bytes(n, x_shape[-1], x_shape[-1], dtype_bytes) < 10 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def cs_conv3x3_pallas(x, k_eq, k_pole, b_eq, b_pole, interpret=False):
    """Fused CS conv, 3x3/stride1: ``(B, 6, n, n, Cin) -> (B, 6, n, n, Cout)``.

    ``b_eq``/``b_pole`` are required (pass zeros for no bias) so the VJP
    signature stays static.  ``interpret=True`` runs the Pallas interpreter
    (CPU tests).
    """
    return _forward(x, k_eq, k_pole, b_eq, b_pole, interpret)


def _forward(x, k_eq, k_pole, b_eq, b_pole, interpret):
    b, nf, n, n2, cin = x.shape
    if nf != 6 or n != n2:
        raise ValueError(f"expected (B, 6, n, n, C), got {x.shape}")
    cout = k_eq.shape[-1]
    strips = gather_halo_strips(x)
    kernel = functools.partial(_kernel, n=n)
    b_eq = b_eq.reshape(1, cout)
    b_pole = b_pole.reshape(1, cout)
    flops = 2 * b * 6 * n * n * 9 * cin * cout
    return pl.pallas_call(
        kernel,
        grid=(b, 6),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n, n, cin), lambda i, f: (i, f, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 4, n, cin), lambda i, f: (i, f, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n, n, cout), lambda i, f: (i, f, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 6, n, n, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2, cin), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, strips, k_eq, k_pole, b_eq, b_pole)


def _xla_reference(x, k_eq, k_pole, b_eq, b_pole):
    from dlwp_cs_tpu.ops.conv import cs_conv

    return cs_conv(x, k_eq, k_pole, bias_eq=b_eq, bias_pole=b_pole, backend="xla")


def _fwd(x, k_eq, k_pole, b_eq, b_pole, interpret):
    out = _forward(x, k_eq, k_pole, b_eq, b_pole, interpret)
    return out, (x, k_eq, k_pole, b_eq, b_pole)


def _bwd(interpret, res, g):
    x, k_eq, k_pole, b_eq, b_pole = res
    # Exact VJP of the identical linear+bias map, via the XLA composition
    # (the unused primal is dead-code-eliminated by XLA).
    _, pullback = jax.vjp(_xla_reference, x, k_eq, k_pole, b_eq, b_pole)
    return pullback(g)


cs_conv3x3_pallas.defvjp(_fwd, _bwd)
