"""Distributed cubed-sphere halo exchange under ``shard_map``.

This is the stencil analog of sequence/context parallelism (SURVEY.md §5.7,
§2b) and the core of BASELINE config 5: activations ``(B, 6, H, W, C)`` are
domain-decomposed by sharding the face-row (eta) axis over the mesh's
``spatial`` axis, and each convolution's halo is assembled from

1. **neighbor-band exchange** — ``lax.ppermute`` passes the ``w`` boundary
   rows between adjacent row-band shards (nearest-neighbor ICI traffic,
   volume O(w * n) per face), and
2. **perimeter exchange** — the 24 face-edge strips (a tiny O(perimeter)
   tensor) are reduced across the spatial axis with ``psum``; every shard
   then assembles its cross-face ghost cells *locally* using the same
   numerically-verified edge table as the single-device path.

The 8 cube corners — the classic 2-hop hazard (a corner ghost needs data from
two remote shards) — are resolved for free: both flanking edge strips are in
the psum'd perimeter, so the corner average is local arithmetic.

Installed via :func:`dlwp_cs_tpu.ops.padding.use_pad_impl`, so the *same
model code* runs single-chip or sharded; equivalence is pinned by
tests/test_parallel.py (1-device vs 8-device allclose — SURVEY.md §4.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.geometry.cubed_sphere import EDGE_E, EDGE_N, EDGE_S, EDGE_W
from dlwp_cs_tpu.ops.padding import padding_plan
from dlwp_cs_tpu.parallel.mesh import SPATIAL_AXIS

__all__ = ["make_sharded_pad", "sharded_cs_pad"]


def sharded_cs_pad(x, width: int, *, axis_name: str = SPATIAL_AXIS, n_shards: int):
    """Halo-pad a row-band-sharded cubed-sphere field (shard-local view).

    Args:
      x: local block ``(B, 6, h, n, C)`` — rows ``[s*h, (s+1)*h)`` of every
        face, where ``s`` is this shard's index along ``axis_name`` and
        ``h = n / n_shards``.
      width: halo width ``w`` with ``1 <= w <= h``.
      axis_name: mesh axis carrying the row decomposition.
      n_shards: static size of that axis.

    Returns the local padded block ``(B, 6, h + 2w, n + 2w, C)`` —
    identical to the corresponding row-slice of ``cs_pad`` on the gathered
    global field.
    """
    b, nf, h, n, c = x.shape
    if nf != 6:
        raise ValueError(f"expected (B, 6, h, n, C), got {x.shape}")
    if h * n_shards != n:
        raise ValueError(
            f"row-band sharding inconsistent: h={h} * shards={n_shards} != n={n}"
        )
    w = int(width)
    if not (1 <= w <= h):
        raise ValueError(f"halo width {w} must be in [1, h={h}]")
    plan = padding_plan(n, w)
    table = plan.table
    s = lax.axis_index(axis_name)
    is_first = (s == 0).astype(x.dtype)
    is_last = (s == n_shards - 1).astype(x.dtype)

    # ---- 1. perimeter strips: (B, 6, 4edges, w, n, C), [d, t] layout ------
    perim = jnp.zeros((b, 6, 4, w, n, c), x.dtype)
    strip_s = x[:, :, :w]  # [d, t] = row d
    strip_n = jnp.flip(x[:, :, h - w :], axis=2)  # [d, t] = row h-1-d
    perim = perim.at[:, :, EDGE_S].set(strip_s * is_first)
    perim = perim.at[:, :, EDGE_N].set(strip_n * is_last)
    strip_w = jnp.swapaxes(x[:, :, :, :w], 2, 3)  # (B,6,w,h,C) [d, t_local]
    strip_e = jnp.swapaxes(jnp.flip(x[:, :, :, n - w :], axis=3), 2, 3)
    zero_row = jnp.zeros((b, 6, w, n, c), x.dtype)
    perim = perim.at[:, :, EDGE_W].set(
        lax.dynamic_update_slice(zero_row, strip_w, (0, 0, 0, s * h, 0))
    )
    perim = perim.at[:, :, EDGE_E].set(
        lax.dynamic_update_slice(zero_row, strip_e, (0, 0, 0, s * h, 0))
    )
    perim = lax.psum(perim, axis_name)

    def ghost_strip(f: int, e: int):
        """(B, w, n, C) [d, t] ghost strip beyond edge ``e`` of face ``f``."""
        link = table[f][e]
        st = perim[:, link.face, link.edge]
        if link.reverse:
            st = jnp.flip(st, axis=2)
        return st

    # ---- 2. neighbor row bands via ppermute -------------------------------
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    below = lax.ppermute(x[:, :, h - w :], axis_name, perm=fwd)  # my bottom halo
    above = lax.ppermute(x[:, :, :w], axis_name, perm=bwd)  # my top halo

    # Global-boundary shards replace the wrapped band with topology ghosts.
    bot_topo = jnp.stack(
        [jnp.flip(ghost_strip(f, EDGE_S), axis=1) for f in range(6)], axis=1
    )
    top_topo = jnp.stack([ghost_strip(f, EDGE_N) for f in range(6)], axis=1)
    bottom = below * (1 - is_first) + bot_topo * is_first
    top = above * (1 - is_last) + top_topo * is_last
    core = jnp.concatenate([bottom, x, top], axis=2)  # (B, 6, h+2w, n, C)

    # ---- 3. W/E ghost columns for all local (incl. halo) rows -------------
    rows_ext = s * h - w + jnp.arange(h + 2 * w)  # global row of each local row
    w_blocks, e_blocks = [], []
    for f in range(6):
        blocks = []
        for e in (EDGE_W, EDGE_E):
            link = table[f][e]
            t_src = jnp.where(link.reverse, n - 1 - rows_ext, rows_ext)
            t_clip = jnp.clip(t_src, 0, n - 1)
            st = perim[:, link.face, link.edge]
            if link.reverse:
                st = jnp.flip(st, axis=2)
                t_take = jnp.clip(rows_ext, 0, n - 1)
            else:
                t_take = t_clip
            g = jnp.take(st, t_take, axis=2)  # (B, w, h+2w, C) [d, row]
            blocks.append(g)
        gw, ge = blocks
        # W: local col w-1-d  ->  flip depth then put depth last
        w_blocks.append(jnp.swapaxes(jnp.flip(gw, axis=1), 1, 2))
        # E: local col w+n+d
        e_blocks.append(jnp.swapaxes(ge, 1, 2))
    west = jnp.stack(w_blocks, axis=1)  # (B, 6, h+2w, w, C)
    east = jnp.stack(e_blocks, axis=1)
    padded = jnp.concatenate([west, core, east], axis=3)  # (B,6,h+2w,n+2w,C)

    # ---- 4. global corners (only on the first/last shard) -----------------
    sw = 0.5 * (padded[:, :, :w, w : w + 1] + padded[:, :, w : w + 1, :w])
    se = 0.5 * (
        padded[:, :, :w, w + n - 1 : w + n] + padded[:, :, w : w + 1, w + n :]
    )
    hw = h + w
    nw = 0.5 * (
        padded[:, :, hw:, w : w + 1] + padded[:, :, hw - 1 : hw, :w]
    )
    ne = 0.5 * (
        padded[:, :, hw:, w + n - 1 : w + n]
        + padded[:, :, hw - 1 : hw, w + n :]
    )
    padded = padded.at[:, :, :w, :w].set(
        sw * is_first + padded[:, :, :w, :w] * (1 - is_first)
    )
    padded = padded.at[:, :, :w, w + n :].set(
        se * is_first + padded[:, :, :w, w + n :] * (1 - is_first)
    )
    padded = padded.at[:, :, hw:, :w].set(
        nw * is_last + padded[:, :, hw:, :w] * (1 - is_last)
    )
    padded = padded.at[:, :, hw:, w + n :].set(
        ne * is_last + padded[:, :, hw:, w + n :] * (1 - is_last)
    )
    return padded


def make_sharded_pad(n_shards: int, axis_name: str = SPATIAL_AXIS):
    """Closure suitable for :func:`dlwp_cs_tpu.ops.padding.use_pad_impl`.

    Inside ``shard_map`` over a mesh whose ``axis_name`` axis has size
    ``n_shards``::

        with use_pad_impl(make_sharded_pad(S)):
            out = model.apply(params, x_local)   # every cs_conv now sharded
    """

    def pad(x, width):
        return sharded_cs_pad(
            x, width, axis_name=axis_name, n_shards=n_shards
        )

    return pad
