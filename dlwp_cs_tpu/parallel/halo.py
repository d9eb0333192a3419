"""Distributed cubed-sphere halo exchange under ``shard_map``.

This is the stencil analog of sequence/context parallelism (SURVEY.md §5.7,
§2b) and the core of BASELINE config 5: activations ``(B, 6, H, W, C)`` are
domain-decomposed by sharding the face-row (eta) axis over the mesh's
``spatial`` axis, and each convolution's halo is assembled from seam-shaped
collectives instead of an all-reduce of the whole perimeter (round 1 psum'd
a ``(B, 6, 4, w, n, C)`` tensor per conv — every shard received every
face's every edge; VERDICT r1 #2).

What each shard actually needs, from the verified edge table:

* **band rows** — the ``w`` rows flanking its band, from its two
  nearest-neighbor shards: 2 ``ppermute`` s (unchanged).
* **equatorial W/E ghosts** — the 4 equatorial ring seams are col<->col with
  ``reverse=False`` (a chirality-consistent-chart invariant, asserted at
  trace time), so the partner columns for the local (and band-halo) rows are
  already LOCAL after the band exchange: zero communication.
* **polar W/E ghosts** — faces 4/5's W/E seams read the global N/S boundary
  rows of faces 1/3: a ``psum`` broadcast of just those 4 row strips
  (``(B, 4, w, n, C)``), each contributed by exactly one end shard.
* **row<->col S/N ghosts** (end shards only) — ghosts 1S/3S/1N/3N read full
  columns of faces 4/5, spread across every shard: one *tiled*
  ``all_gather`` of the 4 thin column strips.
* **row<->row S/N ghosts** (end shards only) — 0S/5N and 0N/4S pair the two
  end shards: one ``ppermute`` on the single pair ``{0 <-> S-1}`` carrying 4
  row strips; interior shards send/receive nothing.

The 8 cube corners — the classic 2-hop hazard — remain local arithmetic on
the end shards, exactly as in round 1.

Installed via :func:`dlwp_cs_tpu.ops.padding.use_pad_impl`, so the *same
model code* runs single-chip or sharded; equivalence is pinned by
tests/test_parallel.py (1-device vs 8-device allclose — SURVEY.md §4.4).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.geometry.cubed_sphere import EDGE_E, EDGE_N, EDGE_S, EDGE_W
from dlwp_cs_tpu.ops.padding import padding_plan
from dlwp_cs_tpu.parallel.mesh import SPATIAL_AXIS

__all__ = [
    "halo_pieces",
    "make_sharded_pad",
    "sharded_cs_pad",
    "use_band_exchange",
]

# Trace-time selection of the band-row transport: "ppermute" (XLA
# collective, default), "rdma" (in-kernel Pallas async remote copy —
# parallel.rdma_halo), "rdma_interpret" (same kernel under the TPU
# interpreter, for CPU-mesh equivalence tests), or "zero" (no transport at
# all — the band rows come back as zeros; used by the fused overlap kernel
# of :mod:`dlwp_cs_tpu.parallel.overlap_band`, which moves the band
# exchange INSIDE its Pallas kernel and only needs the seam-collective
# pieces from :func:`halo_pieces`).
_BAND_IMPL: contextvars.ContextVar = contextvars.ContextVar(
    "cs_band_exchange", default="ppermute"
)
_BAND_IMPLS = ("ppermute", "rdma", "rdma_interpret", "zero")


@contextlib.contextmanager
def use_band_exchange(impl: str):
    """Within this context, band-row halo transfers TRACE with ``impl``."""
    if impl not in _BAND_IMPLS:
        raise ValueError(f"unknown band exchange {impl!r}; want {_BAND_IMPLS}")
    token = _BAND_IMPL.set(impl)
    try:
        yield
    finally:
        _BAND_IMPL.reset(token)


def _check_topology(table):
    """Assert the seam-shape invariants this routing relies on."""
    for f in range(4):
        for e in (EDGE_W, EDGE_E):
            link = table[f][e]
            assert link.face < 4 and not link.reverse and link.edge in (
                EDGE_W,
                EDGE_E,
            ), "equatorial ring seams must be col<->col, unreversed"
    # polar W/E seams read N/S rows of faces 1/3
    assert table[4][EDGE_W].face == 3 and table[4][EDGE_W].edge == EDGE_N
    assert table[4][EDGE_E].face == 1 and table[4][EDGE_E].edge == EDGE_N
    assert table[5][EDGE_W].face == 3 and table[5][EDGE_W].edge == EDGE_S
    assert table[5][EDGE_E].face == 1 and table[5][EDGE_E].edge == EDGE_S


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
    bottom_full, top_full, west_mid, east_mid = halo_pieces(
        x, width, axis_name=axis_name, n_shards=n_shards
    )
    mid = jnp.concatenate([west_mid, x, east_mid], axis=3)
    return jnp.concatenate([bottom_full, mid, top_full], axis=2)


def halo_pieces(x, width: int, *, axis_name: str = SPATIAL_AXIS, n_shards: int):
    """The halo of a row-band-sharded field, as four strips (not assembled).

    Returns ``(bottom, top, west, east)`` for the local band ``(B,6,h,n,C)``:

    * ``bottom``/``top``: ``(B, 6, w, n+2w, C)`` ghost ROWS below/above the
      band INCLUDING the corner columns (global cube corners averaged,
      exactly as ``cs_pad``); ``bottom`` rows are ordered top-down (row 0 =
      outermost ghost), i.e. directly concatenable under the band.
    * ``west``/``east``: ``(B, 6, h, w, C)`` ghost COLUMNS for the local
      rows only (halo-row ghost columns live in ``bottom``/``top``).

    Keeping the pieces separate (rather than materializing the padded
    block) lets a conv formulation that only *corrects* its boundary with
    them — :mod:`dlwp_cs_tpu.parallel.overlap` — keep its interior compute
    data-independent of every collective here, so XLA's latency-hiding
    scheduler can overlap the seam traffic with the MXU work.
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
    _check_topology(table)
    S = n_shards
    s = lax.axis_index(axis_name)
    is_first = (s == 0).astype(x.dtype)
    is_last = (s == S - 1).astype(x.dtype)

    # All strips below use the [d, t] layout: d = distance from the edge
    # (0 = outermost cell of the face), t = position along the edge in
    # ascending global coordinate.
    def s_rows(f):  # (B, w, n, C): face f's global-south rows (valid on first)
        return x[:, f, :w]

    def n_rows(f):  # valid on last shard
        return jnp.flip(x[:, f, h - w :], axis=1)

    def w_cols(f):  # (B, w, h, C), t = local row (valid everywhere)
        return jnp.swapaxes(x[:, f, :, :w], 1, 2)

    def e_cols(f):
        return jnp.swapaxes(jnp.flip(x[:, f, :, n - w :], axis=2), 1, 2)

    # ---- collective 1+2: band rows from neighbor shards (nearest-neighbor)
    band_impl = _BAND_IMPL.get()
    if band_impl == "ppermute" or S == 1:
        fwd = [(i, (i + 1) % S) for i in range(S)]
        bwd = [(i, (i - 1) % S) for i in range(S)]
        below = lax.ppermute(x[:, :, h - w :], axis_name, perm=fwd)
        above = lax.ppermute(x[:, :, :w], axis_name, perm=bwd)
    elif band_impl == "zero":
        below = jnp.zeros_like(x[:, :, h - w :])
        above = jnp.zeros_like(x[:, :, :w])
    else:  # in-kernel Pallas RDMA (parallel.rdma_halo)
        from dlwp_cs_tpu.parallel.rdma_halo import band_exchange_rdma

        below, above = band_exchange_rdma(
            x,
            w,
            axis_name=axis_name,
            n_shards=S,
            interpret=band_impl == "rdma_interpret",
        )

    # ---- collective 3: psum broadcast of the 4 polar-seam boundary rows.
    # Slots: [1S, 3S, 1N, 3N]; exactly one shard contributes each.
    bcast = jnp.stack(
        [
            s_rows(1) * is_first,
            s_rows(3) * is_first,
            n_rows(1) * is_last,
            n_rows(3) * is_last,
        ],
        axis=1,
    )  # (B, 4, w, n, C)
    bcast = lax.psum(bcast, axis_name)

    # ---- collective 4: tiled all_gather of the 4 polar column strips.
    # Slots: [4W, 4E, 5W, 5E]; concatenated over shards along t -> length n.
    cols_local = jnp.stack(
        [w_cols(4), e_cols(4), w_cols(5), e_cols(5)], axis=1
    )  # (B, 4, w, h, C)
    cols = lax.all_gather(cols_local, axis_name, axis=3, tiled=True)

    # ---- collective 5: end<->end exchange of the 4 row<->row seam strips.
    # Only the pair {0, S-1} communicates; interior shards receive zeros.
    # My contribution: first sends [0S, 4S, 0, 0]; last sends [0, 0, 5N, 0N].
    ex_payload = jnp.stack(
        [
            s_rows(0) * is_first,
            s_rows(4) * is_first,
            n_rows(5) * is_last,
            n_rows(0) * is_last,
        ],
        axis=1,
    )  # (B, 4, w, n, C)
    if S == 1:
        ex = ex_payload
    else:
        ex = lax.ppermute(ex_payload, axis_name, perm=[(0, S - 1), (S - 1, 0)])

    # Virtual perimeter: source strip (g, e2) -> (B, w, n, C) in [d, t]
    # layout, defined exactly where it is consumed (masked elsewhere).
    src = {
        (1, EDGE_S): bcast[:, 0],
        (3, EDGE_S): bcast[:, 1],
        (1, EDGE_N): bcast[:, 2],
        (3, EDGE_N): bcast[:, 3],
        (4, EDGE_W): cols[:, 0],
        (4, EDGE_E): cols[:, 1],
        (5, EDGE_W): cols[:, 2],
        (5, EDGE_E): cols[:, 3],
        (0, EDGE_S): ex[:, 0],  # received on last (for ghost 5N)
        (4, EDGE_S): ex[:, 1],  # received on last (for ghost 0N)
        (5, EDGE_N): ex[:, 2],  # received on first (for ghost 0S)
        (0, EDGE_N): ex[:, 3],  # received on first (for ghost 4S)
        # row<->row seams whose both ends live on the SAME end shard (keyed
        # by SOURCE): ghost 5S <- (2,S), ghost 2S <- (5,S) — both strips
        # local on the first shard; ghost 4N <- (2,N), ghost 2N <- (4,N) on
        # the last.
        (2, EDGE_S): s_rows(2),
        (5, EDGE_S): s_rows(5),
        (2, EDGE_N): n_rows(2),
        (4, EDGE_N): n_rows(4),
    }

    def ghost_strip(f: int, e: int):
        """(B, w, n, C) [d, t] ghost strip beyond edge ``e`` of face ``f``."""
        link = table[f][e]
        st = src[(link.face, link.edge)]
        if link.reverse:
            st = jnp.flip(st, axis=2)
        return st

    # ---- assemble band-extended core -------------------------------------
    # Global-boundary shards replace the wrapped band with topology ghosts.
    bot_topo = jnp.stack(
        [jnp.flip(ghost_strip(f, EDGE_S), axis=1) for f in range(6)], axis=1
    )
    top_topo = jnp.stack([ghost_strip(f, EDGE_N) for f in range(6)], axis=1)
    bottom = below * (1 - is_first) + bot_topo * is_first
    top = above * (1 - is_last) + top_topo * is_last
    core = jnp.concatenate([bottom, x, top], axis=2)  # (B, 6, h+2w, n, C)

    # ---- W/E ghost columns for all local (incl. halo) rows ----------------
    rows_ext = s * h - w + jnp.arange(h + 2 * w)  # global row of each local row
    w_blocks, e_blocks = [], []
    for f in range(6):
        blocks = []
        for e in (EDGE_W, EDGE_E):
            link = table[f][e]
            if f < 4:
                # equatorial ring seam: partner column is local in `core`
                # (rev=False col<->col; halo rows covered by the band rows).
                # ghost depth d = partner col n-1-d (E source) or d (W).
                if link.edge == EDGE_E:
                    gcol = jnp.flip(core[:, link.face, :, n - w :], axis=2)
                else:
                    gcol = core[:, link.face, :, :w]
                # gcol: (B, h+2w, w, C) [row, d] -> (B, w, h+2w, C) [d, row]
                g = jnp.swapaxes(gcol, 1, 2)
            else:
                # polar seam: read the broadcast boundary row at the global
                # positions of my local rows (clipped; the out-of-range end
                # entries are overwritten by the corner step on end shards).
                st = src[(link.face, link.edge)]
                if link.reverse:
                    st = jnp.flip(st, axis=2)
                g = jnp.take(
                    st, jnp.clip(rows_ext, 0, n - 1), axis=2
                )  # (B, w, h+2w, C) [d, row]
            blocks.append(g)
        gw, ge = blocks
        # W: local col w-1-d  ->  flip depth then put depth last
        w_blocks.append(jnp.swapaxes(jnp.flip(gw, axis=1), 1, 2))
        # E: local col w+n+d
        e_blocks.append(jnp.swapaxes(ge, 1, 2))
    west = jnp.stack(w_blocks, axis=1)  # (B, 6, h+2w, w, C)
    east = jnp.stack(e_blocks, axis=1)

    # ---- corner columns of the ghost-row strips ---------------------------
    # Interior band boundaries take the ghost-column values at the halo
    # rows; the 8 GLOBAL cube corners (first/last shard only) are averaged
    # over their two flanking edges, exactly as ``cs_pad`` does.
    hw = h + w
    sw = 0.5 * (bottom[:, :, :, 0:1] + west[:, :, w : w + 1, :])
    se = 0.5 * (bottom[:, :, :, n - 1 : n] + east[:, :, w : w + 1, :])
    nw = 0.5 * (top[:, :, :, 0:1] + west[:, :, hw - 1 : hw, :])
    ne = 0.5 * (top[:, :, :, n - 1 : n] + east[:, :, hw - 1 : hw, :])
    bl = west[:, :, :w] * (1 - is_first) + sw * is_first
    br = east[:, :, :w] * (1 - is_first) + se * is_first
    tl = west[:, :, hw:] * (1 - is_last) + nw * is_last
    tr = east[:, :, hw:] * (1 - is_last) + ne * is_last
    bottom_full = jnp.concatenate([bl, bottom, br], axis=3)  # (B,6,w,n+2w,C)
    top_full = jnp.concatenate([tl, top, tr], axis=3)
    return bottom_full, top_full, west[:, :, w:hw], east[:, :, w:hw]


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
