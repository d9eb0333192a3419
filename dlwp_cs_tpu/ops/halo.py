"""The halo-extension linear map E and its scatter-free transpose.

Every cubed-sphere conv backend needs the *corner-extended ghost strips*:
for each (face, edge), the ``n+2`` ghost values beyond that edge — ``n``
interior ghosts from the seam partner plus the two flanking corner ghosts
(average of the two adjacent edges' end ghosts).  That is one linear map

    E : (B, 6, n, n, C)  ->  (B, 6, 4, n+2, C)

with at most two source cells per output (weights 0.5/0.5; interior positions
use the same cell twice).  Forward is two gathers and an add.

The important part is the BACKWARD.  XLA differentiates a gather into a
scatter-add, and TPU scatters serialize badly — round-1's training step ran
four scatters per conv (HLO-verified).  Here ``ext_strips`` carries a
``custom_vjp`` that evaluates Eᵀ as *gathers from the cotangent* instead:
each face-perimeter cell receives from at most 6 ext positions (realized
only at the 24 face-corner cells), read via a precomputed transpose table
and applied with the same masked perimeter-add trick the ring-fix conv uses.
No scatter appears anywhere in the train step's HLO (pinned by test).

Reference parity: this is the TPU-shaped core of
``DLWP/custom.py::CubeSpherePadding2D`` (SURVEY.md §2 row 1); the reference
materializes a padded tensor instead, which costs a full extra activation
round-trip through memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dlwp_cs_tpu.geometry.cubed_sphere import EDGE_E, EDGE_N, EDGE_S, EDGE_W
from dlwp_cs_tpu.ops.padding import padding_plan

__all__ = ["ext_strips", "ext_strips_reference", "ring_add"]

# Max ext-positions feeding one perimeter cell: a face-corner cell is read by
# its 2 seams x (1 interior + 2 corner) entries.
_FAN_IN = 6


@functools.lru_cache(maxsize=32)
def _strip_sources(n: int) -> np.ndarray:
    """Flat cell indices (into 6*n*n) of the 24 oriented interior ghost strips.

    ``[f, e, t]`` is the source cell whose value becomes the ghost beyond
    edge ``e`` of face ``f`` at along-edge position ``t`` (orientation
    reversal already applied).  Derived from the verified edge table.
    """
    table = padding_plan(n, 1).table
    idx = np.empty((6, 4, n), np.int32)
    t = np.arange(n)
    for f in range(6):
        for e in range(4):
            link = table[f][e]
            g = link.face
            tt = t[::-1] if link.reverse else t
            if link.edge == EDGE_S:
                i, j = np.zeros(n, np.int64), tt
            elif link.edge == EDGE_N:
                i, j = np.full(n, n - 1), tt
            elif link.edge == EDGE_W:
                i, j = tt, np.zeros(n, np.int64)
            else:
                i, j = tt, np.full(n, n - 1)
            idx[f, e] = g * n * n + i * n + j
    return idx


@functools.lru_cache(maxsize=32)
def _ext_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(idxA, idxB), each (6, 4, n+2): ext[p] = 0.5*(x[idxA[p]] + x[idxB[p]]).

    Interior positions use idxA == idxB (so 0.5+0.5 reproduces the cell);
    the two end positions are the corner ghosts, averaging the end ghosts of
    the two edges meeting at that corner (same corner semantics as
    ``cs_pad`` / the reference's CubeSpherePadding2D).
    """
    s = _strip_sources(n)  # (6, 4, n)
    idxA = np.empty((6, 4, n + 2), np.int32)
    idxB = np.empty((6, 4, n + 2), np.int32)
    for f in range(6):
        idxA[f, :, 1 : n + 1] = s[f]
        idxB[f, :, 1 : n + 1] = s[f]
        sw = (s[f, EDGE_S, 0], s[f, EDGE_W, 0])
        se = (s[f, EDGE_S, n - 1], s[f, EDGE_E, 0])
        nw = (s[f, EDGE_N, 0], s[f, EDGE_W, n - 1])
        ne = (s[f, EDGE_N, n - 1], s[f, EDGE_E, n - 1])
        for e, (lo, hi) in (
            (EDGE_S, (sw, se)),
            (EDGE_N, (nw, ne)),
            (EDGE_W, (sw, nw)),
            (EDGE_E, (se, ne)),
        ):
            idxA[f, e, 0], idxB[f, e, 0] = lo
            idxA[f, e, n + 1], idxB[f, e, n + 1] = hi
    return idxA, idxB


@functools.lru_cache(maxsize=32)
def _transpose_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-edge-view incoming tables for Eᵀ.

    Returns ``(idx, w)`` of shapes (6, 4, n, _FAN_IN): for the ``t``-th cell
    along edge ``e`` of face ``g`` (S:(0,t), N:(n-1,t), W:(t,0), E:(t,n-1)),
    ``dx_cell += sum_k w[g,e,t,k] * d_ext_flat[idx[g,e,t,k]]``.

    Face-corner cells belong to two views; all their entries are assigned to
    the first view encountered (fixed scan order), the other view carrying
    zero weights there — so the masked perimeter add (which applies both
    views at corner cells) sums each entry exactly once.
    """
    idxA, idxB = _ext_tables(n)
    # cell -> {flat ext position: weight} (interior positions list the same
    # cell as both sources — merge to one weight-1 entry)
    incoming: dict[int, dict[int, float]] = {}
    for f in range(6):
        for e in range(4):
            for t in range(n + 2):
                p = (f * 4 + e) * (n + 2) + t
                for cell in (int(idxA[f, e, t]), int(idxB[f, e, t])):
                    d = incoming.setdefault(cell, {})
                    d[p] = d.get(p, 0.0) + 0.5

    def cell_of(g: int, e: int, t: int) -> int:
        if e == EDGE_S:
            i, j = 0, t
        elif e == EDGE_N:
            i, j = n - 1, t
        elif e == EDGE_W:
            i, j = t, 0
        else:
            i, j = t, n - 1
        return g * n * n + i * n + j

    idx = np.zeros((6, 4, n, _FAN_IN), np.int32)
    w = np.zeros((6, 4, n, _FAN_IN), np.float32)
    claimed: set[int] = set()
    for g in range(6):
        for e in range(4):
            for t in range(n):
                cell = cell_of(g, e, t)
                if cell in claimed:
                    continue  # corner cell already handled by its first view
                claimed.add(cell)
                entries = sorted(incoming.get(cell, {}).items())
                assert len(entries) <= _FAN_IN, (g, e, t, len(entries))
                for k, (p, wk) in enumerate(entries):
                    idx[g, e, t, k] = p
                    w[g, e, t, k] = wk
    return idx, w


# -- forward -----------------------------------------------------------------


def _ext_forward(x):
    b, _, n, _, c = x.shape
    idxA, idxB = _ext_tables(n)
    flat = x.reshape(b, 6 * n * n, c)
    ga = jnp.take(flat, jnp.asarray(idxA.reshape(-1)), axis=1)
    gb = jnp.take(flat, jnp.asarray(idxB.reshape(-1)), axis=1)
    return (0.5 * (ga + gb)).reshape(b, 6, 4, n + 2, c)


@jax.custom_vjp
def ext_strips(x):
    """Corner-extended ghost strips: ``(B, 6, n, n, C) -> (B, 6, 4, n+2, C)``.

    ``[b, f, e]`` is the full ghost line beyond edge ``e`` of face ``f``
    (positions 0 and n+1 are the corner ghosts).  Linear; backward is
    scatter-free (see module docstring).
    """
    return _ext_forward(x)


def ext_strips_reference(x):
    """Same map without the custom VJP (autodiff -> scatter); tests only."""
    return _ext_forward(x)


# -- transpose ---------------------------------------------------------------


def ring_add(base, inc_s, inc_n, inc_w, inc_e):
    """Add per-edge vectors onto each face's perimeter ring (fused wheres).

    ``base``: (B, 6, n, n, D); ``inc_*``: (B, 6, n, D) along-edge vectors
    (S/N indexed by column, W/E by row).  Face-corner cells receive both of
    their edges' entries.  Elementwise only — XLA fuses it into one pass.
    """
    n = base.shape[2]
    row = lax.broadcasted_iota(jnp.int32, (n, n), 0)[None, None, :, :, None]
    col = lax.broadcasted_iota(jnp.int32, (n, n), 1)[None, None, :, :, None]
    zero = jnp.zeros((), base.dtype)
    return (
        base
        + jnp.where(row == 0, inc_s[:, :, None, :, :], zero)
        + jnp.where(row == n - 1, inc_n[:, :, None, :, :], zero)
        + jnp.where(col == 0, inc_w[:, :, :, None, :], zero)
        + jnp.where(col == n - 1, inc_e[:, :, :, None, :], zero)
    )


def _ext_transpose(g):
    """Eᵀ: cotangent (B, 6, 4, n+2, C) -> dx (B, 6, n, n, C), gathers only."""
    b, _, _, np2, c = g.shape
    n = np2 - 2
    idx, w = _transpose_tables(n)
    flat = g.reshape(b, 6 * 4 * (n + 2), c)
    # ONE gather covering all _FAN_IN incoming positions (six separate
    # gathers were ~6x the per-op dispatch cost), then a weighted reduce.
    gk = jnp.take(flat, jnp.asarray(idx.reshape(-1)), axis=1)
    gk = gk.reshape(b, 6, 4, n, _FAN_IN, c)
    wk = jnp.asarray(w).astype(g.dtype)[None, :, :, :, :, None]
    inc = jnp.sum(gk * wk, axis=4)
    dx = jnp.zeros((b, 6, n, n, c), g.dtype)
    return ring_add(dx, inc[:, :, EDGE_S], inc[:, :, EDGE_N],
                    inc[:, :, EDGE_W], inc[:, :, EDGE_E])


def _ext_fwd(x):
    return _ext_forward(x), None


def _ext_bwd(_, g):
    return (_ext_transpose(g),)


ext_strips.defvjp(_ext_fwd, _ext_bwd)
