"""Cross-face halo padding on the cubed sphere (XLA reference path).

Capability parity with the reference's ``DLWP/custom.py::CubeSpherePadding2D``
(SURVEY.md §2 row 1): each face's edges are padded with the adjacent faces'
edge rows/columns, applying the per-edge index transform required by the cube
topology, with the 8 cube corners filled by averaging the two flanking edge
ghosts.  Unlike the reference (a Keras layer built from ``tf.concat`` /
``reverse`` / ``transpose``), this is a pure function of a precomputed
``PaddingPlan`` derived from the numerically-verified edge table in
:mod:`dlwp_cs_tpu.geometry` — all slicing is static so XLA fuses the whole
exchange, and the same plan drives the sharded (``shard_map``) and Pallas
fused-kernel variants.

Array convention: channels-last ``(..., 6, H, W, C)`` with ``H == W == n``
(rows = eta/south->north, cols = xi/west->east; see geometry module).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax.numpy as jnp

from dlwp_cs_tpu.geometry.cubed_sphere import (
    EDGE_E,
    EDGE_N,
    EDGE_S,
    EDGE_W,
    EdgeLink,
    edge_table,
    verify_edge_table,
)

__all__ = ["cs_pad", "padding_plan", "PaddingPlan", "use_pad_impl"]

# Trace-time dispatch hook: the distributed (shard_map) and Pallas fused
# implementations install themselves here so model code — which only ever
# calls :func:`cs_pad` — runs unchanged on 1 chip, on a sharded mesh, or on
# the fused-kernel path.
_PAD_IMPL: contextvars.ContextVar = contextvars.ContextVar("cs_pad_impl", default=None)


@contextlib.contextmanager
def use_pad_impl(fn):
    """Within this context, ``cs_pad(x, w)`` delegates to ``fn(x, w)``.

    Used by ``parallel.halo`` (shard_map halo exchange) and ``ops.pallas``
    (fused kernels); dispatch happens at trace time, so there is no runtime
    cost inside jit.
    """
    token = _PAD_IMPL.set(fn)
    try:
        yield
    finally:
        _PAD_IMPL.reset(token)


class PaddingPlan:
    """Frozen description of one halo exchange: resolution ``n``, width ``w``."""

    def __init__(self, n: int, width: int):
        if width < 1:
            raise ValueError(f"pad width must be >= 1, got {width}")
        if width > n:
            raise ValueError(f"pad width {width} exceeds face size {n}")
        verify_edge_table(n)  # cheap numpy re-assert: topology can't rot silently
        self.n = int(n)
        self.width = int(width)
        self.table: tuple[tuple[EdgeLink, ...], ...] = edge_table()

    def __repr__(self) -> str:  # pragma: no cover
        return f"PaddingPlan(n={self.n}, width={self.width})"


@functools.lru_cache(maxsize=32)
def padding_plan(n: int, width: int) -> PaddingPlan:
    return PaddingPlan(n, width)


def _edge_strip(xf, edge: int, w: int):
    """Strip of ``w`` cell layers adjacent to ``edge`` of one face.

    ``xf``: ``(..., n, n, C)``. Returns ``(..., w, n, C)`` indexed
    ``[d, t]`` = cell at depth ``d`` from the edge, position ``t`` along the
    edge (t runs in the +xi direction for S/N edges, +eta for W/E).
    """
    if edge == EDGE_S:
        return xf[..., :w, :, :]
    if edge == EDGE_N:
        return jnp.flip(xf[..., -w:, :, :], axis=-3)
    if edge == EDGE_W:
        return jnp.swapaxes(xf[..., :, :w, :], -3, -2)
    if edge == EDGE_E:
        return jnp.swapaxes(jnp.flip(xf[..., :, -w:, :], axis=-2), -3, -2)
    raise ValueError(f"bad edge {edge}")


def cs_pad(x, width: int):
    """Halo-pad a cubed-sphere field across faces.

    Args:
      x: ``(..., 6, n, n, C)`` channels-last cubed-sphere field.
      width: halo width ``w >= 1`` (e.g. 1 for a 3x3 stencil).

    Returns:
      ``(..., 6, n + 2w, n + 2w, C)``.  Edge ghosts are exact copies of the
      neighbor faces' interior cells; the four ``w x w`` corner blocks are the
      average of the two flanking edge-ghost cells (replicate-extended), which
      is smooth for smooth fields and exact for constants.
    """
    impl = _PAD_IMPL.get()
    if impl is not None:
        return impl(x, width)
    n = x.shape[-2]
    if x.shape[-3] != n or x.shape[-4] != 6:
        raise ValueError(f"expected (..., 6, n, n, C) with square faces, got {x.shape}")
    plan = padding_plan(n, width)
    w = plan.width

    faces = []
    for f in range(6):
        xf = x[..., f, :, :, :]
        pad_cfg = [(0, 0)] * (xf.ndim - 3) + [(w, w), (w, w), (0, 0)]
        pf = jnp.pad(xf, pad_cfg)
        for e in range(4):
            link = plan.table[f][e]
            strip = _edge_strip(x[..., link.face, :, :, :], link.edge, w)
            if link.reverse:
                strip = jnp.flip(strip, axis=-2)  # flip along-edge coordinate t
            if e == EDGE_S:
                # ghost rows w-1-d, cols w..w+n
                pf = pf.at[..., :w, w : w + n, :].set(jnp.flip(strip, axis=-3))
            elif e == EDGE_N:
                pf = pf.at[..., w + n :, w : w + n, :].set(strip)
            elif e == EDGE_W:
                block = jnp.swapaxes(jnp.flip(strip, axis=-3), -3, -2)
                pf = pf.at[..., w : w + n, :w, :].set(block)
            else:  # EDGE_E
                pf = pf.at[..., w : w + n, w + n :, :].set(jnp.swapaxes(strip, -3, -2))
        # Corners: average of the two flanking edge ghosts nearest the corner.
        sw = 0.5 * (pf[..., :w, w : w + 1, :] + pf[..., w : w + 1, :w, :])
        se = 0.5 * (pf[..., :w, w + n - 1 : w + n, :] + pf[..., w : w + 1, w + n :, :])
        nw = 0.5 * (
            pf[..., w + n :, w : w + 1, :] + pf[..., w + n - 1 : w + n, :w, :]
        )
        ne = 0.5 * (
            pf[..., w + n :, w + n - 1 : w + n, :]
            + pf[..., w + n - 1 : w + n, w + n :, :]
        )
        pf = pf.at[..., :w, :w, :].set(sw)
        pf = pf.at[..., :w, w + n :, :].set(se)
        pf = pf.at[..., w + n :, :w, :].set(nw)
        pf = pf.at[..., w + n :, w + n :, :].set(ne)
        faces.append(pf)
    return jnp.stack(faces, axis=-4)
