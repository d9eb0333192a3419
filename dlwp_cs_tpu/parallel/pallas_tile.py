"""Shard-local fused Pallas conv for the 2-D (row x column) tiling.

VERDICT r4 next #7: the fused VMEM band conv existed only for the 1-D
row-band path (:mod:`dlwp_cs_tpu.parallel.pallas_band`), so the flagship's
spatial-parallel ceiling was 4-way fused / 16-way unfused.  This module is
the 2-D counterpart: the same ``ops.pallas_conv._kernel`` (instantiated
with the tile's ``h`` rows and ``wl`` columns) consumes the ALREADY-
EXCHANGED ghost strips of :func:`dlwp_cs_tpu.parallel.halo2d.halo_pieces_2d`
and assembles each padded tile in VMEM — zero per-conv XLA halo-assembly
ops, at any ``sy x sx`` tiling with ``h <= wl`` (the kernel's ext-strip
layout packs the W/E ghost columns into the S/N rows' ``wl + 2`` buffer).

Division of labor mirrors the band path: the 2-D exchange (row/column
ppermutes + the masked boundary psum + corner averaging) runs in XLA
before the kernel, so all topology stays in ``parallel.halo2d``; the
backward is the exact composition VJP through the pad-then-VALID
formulation the 2-D path uses anyway.  Unlike the RDMA overlap kernel
(:mod:`parallel.overlap_band`) there is no in-kernel collective, so the
kernel is safe under every execution mode, including eager CPU grads.

Reference parity: CubeSpherePadding2D + CubeSphereConv2D under 2-D domain
decomposition (``DLWP/custom.py`` — SURVEY.md §2 rows 1-2, §5.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlwp_cs_tpu.ops.packing import block_diag_taps, pack_batch, unpack_batch
from dlwp_cs_tpu.ops.pallas_conv import (
    _kernel,
    _pack_factor,
    vmem_estimate_bytes,
)
from dlwp_cs_tpu.parallel.halo2d import halo_pieces_2d
from dlwp_cs_tpu.parallel.mesh import SPATIAL_AXIS, SPATIAL_X_AXIS

__all__ = [
    "make_tile_pallas_conv3x3",
    "tile_conv3x3_pallas",
    "tile_pallas_supported",
]


def tile_pallas_supported(
    x_shape, sy: int, sx: int, dtype, cout: int | None = None
) -> bool:
    """Is the fused tile kernel applicable to local tiles of this shape?

    ``cout`` defaults to ``cin``; channel-expanding convs must pass the
    real output width, and the gate includes Mosaic's per-step f32
    tap-accumulation stack (~``6*h*wl*cout*4`` bytes) — exactly the term
    whose omission made n=96, cin=12, cout=64 a compile-time VMEM OOM on
    the full-face kernel (ops/pallas_conv.py::pallas_supported).
    """
    if jnp.dtype(dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    b, nf, h, wl, c = x_shape
    if nf != 6 or h * sy != wl * sx or h < 1 or wl < 4:
        return False
    if h > wl:  # ext layout packs W/E strips into the (wl+2) row buffer
        return False
    cout = c if cout is None else int(cout)
    dtype_bytes = jnp.dtype(dtype).itemsize
    stack = 6 * h * wl * cout * 4
    return (
        vmem_estimate_bytes(wl, c, cout, dtype_bytes, h=h) + stack
        < 10 * 2**20
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def tile_conv3x3_pallas(
    x, k_eq, k_pole, b_eq, b_pole, axis_y, axis_x, sy, sx, interpret=False
):
    """Fused CS tile conv, 3x3/stride-1: ``(B,6,h,wl,Cin) -> (B,6,h,wl,Cout)``.

    ``x`` is the shard-local tile (rows ``[iy*h, (iy+1)*h)``, columns
    ``[jx*wl, (jx+1)*wl)`` of every face); must be called inside
    ``shard_map`` over ``(axis_y, axis_x)``.  Exactly the corresponding
    tile of the single-device ``cs_conv`` (tests/test_pallas_tile.py).
    """
    return _forward(x, k_eq, k_pole, b_eq, b_pole, axis_y, axis_x, sy, sx,
                    interpret)


def _forward(x, k_eq, k_pole, b_eq, b_pole, axis_y, axis_x, sy, sx,
             interpret):
    b, nf, h, wl, cin = x.shape
    if nf != 6 or h * sy != wl * sx:
        raise ValueError(
            f"expected local tile (B, 6, n/{sy}, n/{sx}, C), got {x.shape}"
        )
    if h > wl:
        raise ValueError(
            f"tile kernel needs h <= wl (got h={h}, wl={wl}): the W/E ghost "
            "strips ride in the (wl+2) ext buffer"
        )
    cout = k_eq.shape[-1]
    k_eq = k_eq.astype(x.dtype)
    k_pole = k_pole.astype(x.dtype)
    b_eq = b_eq.reshape(1, cout).astype(x.dtype)
    b_pole = b_pole.reshape(1, cout).astype(x.dtype)
    p = _pack_factor(b, wl, cin, cout, jnp.dtype(x.dtype).itemsize, h=h)
    if p > 1:
        x = pack_batch(x, p)
        k_eq = block_diag_taps(k_eq, p)
        k_pole = block_diag_taps(k_pole, p)
        b_eq = jnp.tile(b_eq, (1, p))
        b_pole = jnp.tile(b_pole, (1, p))
        b, cin, cout = b // p, p * cin, p * cout

    bottom, top, west, east = halo_pieces_2d(
        x, 1, axis_y=axis_y, axis_x=axis_x, sy=sy, sx=sx
    )

    def we(col):  # (B, 6, h, 1, C) -> (B, 6, wl+2, C) at positions 1..h
        return jnp.pad(
            col[:, :, :, 0], ((0, 0), (0, 0), (1, wl + 1 - h), (0, 0))
        )

    ext = jnp.stack(
        [bottom[:, :, 0], top[:, :, 0], we(west), we(east)], axis=2
    )  # (B, 6, 4, wl+2, C)

    kernel = functools.partial(_kernel, n=wl, h=h)
    flops = 2 * b * 6 * h * wl * 9 * cin * cout
    out = pl.pallas_call(
        kernel,
        grid=(b, 6),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, wl, cin), lambda i, f: (i, f, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 4, wl + 2, cin), lambda i, f: (i, f, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, wl, cout), lambda i, f: (i, f, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 6, h, wl, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, wl + 2, cin), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, ext, k_eq, k_pole, b_eq, b_pole)
    return unpack_batch(out, p) if p > 1 else out


def _reference(x, k_eq, k_pole, b_eq, b_pole, axis_y, axis_x, sy, sx):
    # pad-then-VALID through the installed 2-D pad — the formulation the
    # 2-D path runs without the kernel; its collectives' transposes are
    # standard JAX rules.  The conv3x3 impl is explicitly CLEARED: when
    # this runs as the kernel's backward (or its fallback) the installed
    # impl is the kernel closure itself — recursing would loop forever.
    from dlwp_cs_tpu.ops.conv import cs_conv, use_conv3x3_impl
    from dlwp_cs_tpu.ops.padding import use_pad_impl
    from dlwp_cs_tpu.parallel.halo2d import make_sharded_pad_2d

    with use_conv3x3_impl(None), \
            use_pad_impl(make_sharded_pad_2d(sy, sx, axis_y, axis_x)):
        return cs_conv(
            x, k_eq, k_pole, bias_eq=b_eq, bias_pole=b_pole, backend="xla"
        )


def _fwd(x, k_eq, k_pole, b_eq, b_pole, axis_y, axis_x, sy, sx, interpret):
    out = _forward(x, k_eq, k_pole, b_eq, b_pole, axis_y, axis_x, sy, sx,
                   interpret)
    return out, (x, k_eq, k_pole, b_eq, b_pole)


def _bwd(axis_y, axis_x, sy, sx, interpret, res, g):
    x, k_eq, k_pole, b_eq, b_pole = res
    _, pullback = jax.vjp(
        lambda *a: _reference(*a, axis_y, axis_x, sy, sx),
        x, k_eq, k_pole, b_eq, b_pole,
    )
    return pullback(g)


tile_conv3x3_pallas.defvjp(_fwd, _bwd)


def make_tile_pallas_conv3x3(
    sy: int,
    sx: int,
    axis_y: str = SPATIAL_AXIS,
    axis_x: str = SPATIAL_X_AXIS,
    *,
    interpret: bool = False,
):
    """Closure for :func:`dlwp_cs_tpu.ops.conv.use_conv3x3_impl`.

    Falls back to pad-then-VALID for tiles the kernel cannot take (thin
    tiles, h > wl, channels past the VMEM gate, f64 tests).
    """

    def conv(x, k_eq, k_pole, bias_eq, bias_pole):
        if not tile_pallas_supported(x.shape, sy, sx, x.dtype,
                                     cout=k_eq.shape[-1]):
            return _reference(
                x, k_eq, k_pole, bias_eq, bias_pole, axis_y, axis_x, sy, sx
            )
        cout = k_eq.shape[-1]
        zb = jnp.zeros((cout,), x.dtype)
        return tile_conv3x3_pallas(
            x,
            k_eq,
            k_pole,
            zb if bias_eq is None else bias_eq,
            zb if bias_pole is None else bias_pole,
            axis_y,
            axis_x,
            sy,
            sx,
            interpret,
        )

    return conv
