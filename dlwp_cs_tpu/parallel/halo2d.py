"""2-D (row x column) cubed-sphere domain decomposition under ``shard_map``.

Extends the 1-D row-band halo exchange (:mod:`dlwp_cs_tpu.parallel.halo`)
to the full intra-face tiling of SURVEY.md §5.7 / §5.8: activations
``(B, 6, H, W, C)`` are sharded over BOTH the face-row axis (mesh axis
``spatial``) and the face-column axis (mesh axis ``spatial_x``), so spatial
parallelism scales as ``Sy * Sx`` — e.g. 4 x 4 = 16-way at C48 where the
1-D decomposition capped at 4 (VERDICT r2 weak/missing #3).

Exchange structure (per halo width ``w``):

1. **Row ppermute** along ``spatial``: each shard receives the ``w`` rows
   flanking its band from its two row neighbors.
2. **Column ppermute** along ``spatial_x`` *on the row-extended block*, the
   standard two-step trick: the transferred columns already include the
   neighbor's ghost rows, so interior tile corners need no diagonal hop.
3. **Boundary-strip psum**: the 24 global face-edge strips
   ``(B, 6, 4, w, n, C)`` are assembled by one masked ``psum`` over both
   spatial axes (each strip element is contributed by exactly one shard) and
   consumed locally through the verified edge table.  This is O(perimeter)
   traffic — more than the 1-D path's seam-routed collectives but far less
   than a band gather, and correct for every ``(Sy, Sx)`` including the
   row<->col seams whose producer/consumer decompositions are transposed
   (the case that makes seam routing combinatorial in 2-D).
4. **Corner fill**: global cube corners are averaged from their two flanking
   edge ghosts on the owning shard, bit-identical to ``ops.padding.cs_pad``.

With ``Sx == 1`` this reduces to a row-band decomposition and is
equivalence-tested against both :func:`dlwp_cs_tpu.ops.padding.cs_pad` and
the 1-D seam-routed path.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.geometry.cubed_sphere import EDGE_E, EDGE_N, EDGE_S, EDGE_W
from dlwp_cs_tpu.ops.padding import padding_plan
from dlwp_cs_tpu.parallel.mesh import SPATIAL_AXIS, SPATIAL_X_AXIS

__all__ = ["halo_pieces_2d", "sharded_cs_pad_2d", "make_sharded_pad_2d"]


def sharded_cs_pad_2d(
    x,
    width: int,
    *,
    axis_y: str = SPATIAL_AXIS,
    axis_x: str = SPATIAL_X_AXIS,
    sy: int,
    sx: int,
):
    """Halo-pad a 2-D-tiled cubed-sphere field (shard-local view).

    Args:
      x: local block ``(B, 6, h, wl, C)`` — rows ``[iy*h, (iy+1)*h)`` and
        columns ``[jx*wl, (jx+1)*wl)`` of every face, where ``iy``/``jx``
        are this shard's indices along ``axis_y``/``axis_x``.
      width: halo width ``w`` with ``1 <= w <= min(h, wl)``.
      sy, sx: static sizes of the two spatial mesh axes.

    Returns the local padded block ``(B, 6, h + 2w, wl + 2w, C)`` — identical
    to the corresponding row/column slice of ``cs_pad`` on the gathered
    global field.
    """
    bottom_full, top_full, west_mid, east_mid = halo_pieces_2d(
        x, width, axis_y=axis_y, axis_x=axis_x, sy=sy, sx=sx
    )
    mid = jnp.concatenate([west_mid, x, east_mid], axis=3)
    return jnp.concatenate([bottom_full, mid, top_full], axis=2)


def halo_pieces_2d(
    x,
    width: int,
    *,
    axis_y: str = SPATIAL_AXIS,
    axis_x: str = SPATIAL_X_AXIS,
    sy: int,
    sx: int,
):
    """The halo of a 2-D-tiled field as four strips (not assembled).

    Returns ``(bottom, top, west, east)`` for the local tile
    ``(B, 6, h, wl, C)``: ``bottom``/``top`` are ``(B, 6, w, wl+2w, C)``
    ghost ROWS including the corner columns; ``west``/``east`` are
    ``(B, 6, h, w, C)`` ghost COLUMNS for the local rows only — the same
    contract as the 1-D :func:`dlwp_cs_tpu.parallel.halo.halo_pieces`, so
    a fused tile conv (:mod:`dlwp_cs_tpu.parallel.pallas_tile`) can
    consume the pieces without materializing the padded block.
    """
    b, nf, h, wl, c = x.shape
    if nf != 6:
        raise ValueError(f"expected (B, 6, h, wl, C), got {x.shape}")
    n = h * sy
    if wl * sx != n:
        raise ValueError(
            f"tiling inconsistent: rows {h}x{sy} != cols {wl}x{sx}"
        )
    w = int(width)
    if not (1 <= w <= min(h, wl)):
        raise ValueError(f"halo width {w} must be in [1, min(h={h}, wl={wl})]")
    plan = padding_plan(n, w)
    table = plan.table
    # A size-1 axis may not exist on the mesh at all (create_mesh only adds
    # 'spatial_x' when > 1); index statically and skip its collectives.
    iy = lax.axis_index(axis_y) if sy > 1 else jnp.zeros((), jnp.int32)
    jx = lax.axis_index(axis_x) if sx > 1 else jnp.zeros((), jnp.int32)
    one = jnp.ones((), x.dtype)
    is_bot = jnp.where(iy == 0, one, 0)
    is_top = jnp.where(iy == sy - 1, one, 0)
    is_left = jnp.where(jx == 0, one, 0)
    is_right = jnp.where(jx == sx - 1, one, 0)

    # ---- global boundary strips: one masked psum over both axes -----------
    # bnd[:, f, e] = (B, w, n, C) [d, t]: the w outermost cell layers of face
    # f adjacent to its edge e, in _edge_strip orientation (d = distance from
    # the edge, t ascending along it).
    def place(bnd, edge, piece, t0):
        # piece: (B, 6, w, len, C) masked by ownership; t0: this shard's
        # along-edge offset.  Non-owners insert zeros — harmless under psum.
        upd = piece[:, :, None]
        return lax.dynamic_update_slice(
            bnd, upd.astype(bnd.dtype), (0, 0, edge, 0, t0, 0)
        )

    strips = []
    for edge in range(4):
        bnd = jnp.zeros((b, 6, 1, w, n, c), x.dtype)
        if edge == EDGE_S:
            piece, t0 = x[:, :, :w] * is_bot, jx * wl
        elif edge == EDGE_N:
            piece, t0 = jnp.flip(x[:, :, h - w :], axis=2) * is_top, jx * wl
        elif edge == EDGE_W:
            piece = jnp.swapaxes(x[:, :, :, :w], 2, 3) * is_left
            t0 = iy * h
        else:  # EDGE_E
            piece = jnp.swapaxes(jnp.flip(x[:, :, :, wl - w :], axis=3), 2, 3)
            piece, t0 = piece * is_right, iy * h
        strips.append(place(bnd, 0, piece, t0)[:, :, 0])
    bnd = jnp.stack(strips, axis=2)  # (B, 6, 4, w, n, C)
    psum_axes = tuple(
        a for a, s in ((axis_y, sy), (axis_x, sx)) if s > 1
    )
    if psum_axes:
        bnd = lax.psum(bnd, psum_axes)

    # ghost strips beyond each (face, edge), full length, [d, t] layout
    fidx = np.empty((6, 4), np.int32)
    eidx = np.empty((6, 4), np.int32)
    rev = np.zeros((6, 4), bool)
    for f in range(6):
        for e in range(4):
            link = table[f][e]
            fidx[f, e], eidx[f, e], rev[f, e] = link.face, link.edge, link.reverse
    g = bnd[:, fidx, eidx]  # (B, 6, 4, w, n, C)
    ghost = jnp.where(
        jnp.asarray(rev)[None, :, :, None, None, None], jnp.flip(g, axis=-2), g
    )

    # zero-extended along t so a clamped-free dynamic slice covers the
    # [t0 - w, t0 + len + w) window; the zero ends surface only inside
    # global corner blocks, which are overwritten by the corner fill.
    gpad = jnp.pad(ghost, [(0, 0)] * 3 + [(0, 0), (w, w), (0, 0)])

    def ghost_block(e: int, t0, length: int):
        """(B, 6, w, length + 2w, C) slice of edge-e ghosts at offset t0."""
        return lax.dynamic_slice(
            gpad[:, :, e],
            (0, 0, 0, t0, 0),
            (b, 6, w, length + 2 * w, c),
        )

    # ---- step 1: row exchange + global S/N replacement --------------------
    if sy > 1:
        fwd_y = [(i, (i + 1) % sy) for i in range(sy)]
        bwd_y = [(i, (i - 1) % sy) for i in range(sy)]
        below = lax.ppermute(x[:, :, h - w :], axis_y, perm=fwd_y)
        above = lax.ppermute(x[:, :, :w], axis_y, perm=bwd_y)
    else:
        below = x[:, :, h - w :]
        above = x[:, :, :w]
    # my wl columns of the global ghost rows (offset jx*wl in gpad = t0)
    gS = ghost_block(EDGE_S, jx * wl, wl)[:, :, :, w : w + wl]
    gN = ghost_block(EDGE_N, jx * wl, wl)[:, :, :, w : w + wl]
    bottom = below * (1 - is_bot) + jnp.flip(gS, axis=2) * is_bot
    top = above * (1 - is_top) + gN * is_top
    core = jnp.concatenate([bottom, x, top], axis=2)  # (B, 6, h+2w, wl, C)

    # ---- step 2: column exchange on the row-extended block ----------------
    if sx > 1:
        fwd_x = [(j, (j + 1) % sx) for j in range(sx)]
        bwd_x = [(j, (j - 1) % sx) for j in range(sx)]
        left_x = lax.ppermute(core[:, :, :, wl - w :], axis_x, perm=fwd_x)
        right_x = lax.ppermute(core[:, :, :, :w], axis_x, perm=bwd_x)
    else:
        left_x = core[:, :, :, wl - w :]
        right_x = core[:, :, :, :w]
    # global W/E ghost columns for all my h + 2w padded rows:
    # cs_pad writes W block[row=t, col=w-1-d], E block[row=t, col=d].
    gW = ghost_block(EDGE_W, iy * h, h)  # (B, 6, w, h+2w, C) [d, t=row]
    gE = ghost_block(EDGE_E, iy * h, h)
    w_block = jnp.swapaxes(jnp.flip(gW, axis=2), 2, 3)  # (B, 6, h+2w, w, C)
    e_block = jnp.swapaxes(gE, 2, 3)
    left = left_x * (1 - is_left) + w_block * is_left
    right = right_x * (1 - is_right) + e_block * is_right

    # ---- step 3: global cube corners (cs_pad's averaging), expressed on
    # the PIECES (bottom/top are core's ghost-row bands; left/right carry
    # the ghost columns for all h + 2w padded rows).
    hw = h + w
    sw = 0.5 * (bottom[:, :, :, 0:1] + left[:, :, w : w + 1, :])
    se = 0.5 * (bottom[:, :, :, wl - 1 : wl] + right[:, :, w : w + 1, :])
    nw = 0.5 * (top[:, :, :, 0:1] + left[:, :, hw - 1 : hw, :])
    ne = 0.5 * (top[:, :, :, wl - 1 : wl] + right[:, :, hw - 1 : hw, :])
    c_sw = is_bot * is_left
    c_se = is_bot * is_right
    c_nw = is_top * is_left
    c_ne = is_top * is_right
    bottom_full = jnp.concatenate(
        [
            left[:, :, :w] * (1 - c_sw) + sw * c_sw,
            bottom,
            right[:, :, :w] * (1 - c_se) + se * c_se,
        ],
        axis=3,
    )
    top_full = jnp.concatenate(
        [
            left[:, :, hw:] * (1 - c_nw) + nw * c_nw,
            top,
            right[:, :, hw:] * (1 - c_ne) + ne * c_ne,
        ],
        axis=3,
    )
    return bottom_full, top_full, left[:, :, w:hw], right[:, :, w:hw]


def make_sharded_pad_2d(
    sy: int,
    sx: int,
    axis_y: str = SPATIAL_AXIS,
    axis_x: str = SPATIAL_X_AXIS,
):
    """Closure for :func:`dlwp_cs_tpu.ops.padding.use_pad_impl` under a
    ``('data', 'spatial', 'spatial_x')`` mesh."""

    def pad(x, width):
        return sharded_cs_pad_2d(
            x, width, axis_y=axis_y, axis_x=axis_x, sy=sy, sx=sx
        )

    return pad
