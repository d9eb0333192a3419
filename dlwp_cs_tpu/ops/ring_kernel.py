"""Pallas ring-fix kernel: the halo correction as ONE kernel per conv.

Round-3's corrected micro-timing (PERF.md, tools/halo_micro.py) showed that
XLA's plain UNPACKED SAME conv is far faster than every fused formulation's
conv core at the U-Net's outer levels (49 us vs the Pallas kernel's 219 at
n=48/c=32; 177 vs 686 at the decoder's 96->32), and that what keeps the
fused paths competitive is only the cost of the ring machinery in XLA
(~250-680 us/conv of windows/stacks/dots/selects).  This module splits the
difference: the convs run as XLA's own SAME convs (its best small-channel
formulation, which block-diag packing only pessimizes), structured as TWO
full 6-face convs (the face-slice + concat structure measured 437 us/conv
at the outer level vs 105.7 for dual convs — tools/groupconv_micro.py),
and ONE Pallas kernel does the weight-group select, the O(perimeter) ring
fixes, and the boundary masked-add in VMEM:

    cs_conv3x3_xring(x, ...) = xring_fused_apply(conv6(x, k_eq),
                                                 conv6(x, k_pole),
                                                 ext_strips(x))

(The unfused pieces — ``ring_fixes_pallas`` + ``ring_apply`` — stay
exported: the separate XLA apply pass measured 142 us of unfused
where-adds, the motivation for the fused kernel.)

Exactly the ring-fix linear map (pinned by tests/test_ring_kernel.py), so
the measured-best training backward — the scatter-free XLA composition VJP
through ``cs_conv3x3_ringfix`` — applies unchanged.

Reference parity: CubeSpherePadding2D + CubeSphereConv2D fused
(``DLWP/custom.py`` — SURVEY.md §2 rows 1-2); the split is TPU shaping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import lax

from dlwp_cs_tpu.ops.halo import ext_strips
from dlwp_cs_tpu.ops.ringfix import _same_conv, add_group_bias

__all__ = [
    "cs_conv3x3_xring",
    "ring_fixes_pallas",
    "ring_apply",
    "split_vjp",
    "xring_fused_apply",
]


def _ring_kernel(ext_ref, tq_ref, tp_ref, cq_ref, cp_ref, fix_ref, cor_ref,
                 *, n, cin):
    """Fixes for ALL batch items of one face: 12 batched dots + 4 corner dots.

    Grid is ``(6,)`` over faces only: a per-(batch, face) grid made the
    launch/DMA overhead dominate the tiny per-step work (625 us/conv at
    n=48/c=32, measured); batching the B rows into each dot amortizes it.

    ``tq``/``tp``: (4, 3, Cin, D) per-edge per-tap matrices (equatorial /
    polar); ``cq``/``cp``: (4, Cin, D) per-corner taps.  Corners are four
    separate (B, C) x (C, D) dots written at lane offsets of the (B, 4D)
    output rows: a lane-CONCAT of strip rows taken from different sublane
    offsets is unlowerable ("result/input offset mismatch on non-concat
    dimension", hardware-bisected), while lane-offset stores are fine.
    """
    d = cq_ref.shape[-1]
    b = ext_ref.shape[0]
    f = pl.program_id(0)
    is_eq = f < 4
    for e in range(4):
        strips = ext_ref[:, 0, e]  # (B, n+2, Cin)
        acc = jnp.zeros((b * n, fix_ref.shape[-1]), jnp.float32)
        for dy in range(3):
            taps = jnp.where(is_eq, tq_ref[e, dy], tp_ref[e, dy])  # (Cin, D)
            acc += jax.lax.dot_general(
                strips[:, dy : dy + n, :].reshape(b * n, cin), taps,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        fix_ref[:, 0, e] = acc.reshape(b, n, -1).astype(fix_ref.dtype)
    # corners [sw, se, nw, ne] = ends of the S/N strips
    s_rows = ext_ref[:, 0, 0]  # (B, n+2, Cin)
    n_rows = ext_ref[:, 0, 1]
    srcs = (s_rows[:, 0], s_rows[:, n + 1], n_rows[:, 0], n_rows[:, n + 1])
    for ci, src in enumerate(srcs):
        ct = jnp.where(is_eq, cq_ref[ci], cp_ref[ci])  # (Cin, D)
        cor = jax.lax.dot_general(
            src, ct,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, D)
        cor_ref[:, 0, :, ci * d : (ci + 1) * d] = (
            cor[:, None, :].astype(cor_ref.dtype)
        )


def _edge_tap_tensor(k):
    """(3, 3, Cin, D) -> (4, 3, Cin, D): per-edge [S, N, W, E] tap rows.

    Edge e's fix contracts the strip's 3 shifted slices with the kernel's
    outside row/column — k[0] (S), k[2] (N), k[:, 0] (W), k[:, 2] (E) —
    matching ``ops.ringfix.ring_term``'s edge_taps layout.
    """
    return jnp.stack([k[0], k[2], k[:, 0], k[:, 2]], axis=0)


def _corner_taps(k):
    """(3, 3, Cin, D) -> (4, Cin, D) corner taps in [sw, se, nw, ne] order."""
    return jnp.stack([k[0, 0], k[0, 2], k[2, 0], k[2, 2]], axis=0)


def ring_fixes_pallas(ext, k_eq, k_pole, *, interpret: bool = False):
    """Edge fixes + corner corrections from the ghost strips, one kernel.

    ``ext``: (B, 6, 4, n+2, Cin) from :func:`ops.halo.ext_strips`.
    Returns ``(fixes, corners)``: (B, 6, 4, n, D) in [S, N, W, E] edge
    order and (B, 6, 4, D) in [sw, se, nw, ne] corner order.
    """
    b, nf, ne, np2, cin = ext.shape
    n = np2 - 2
    d = k_eq.shape[-1]
    dt = ext.dtype
    tq = _edge_tap_tensor(k_eq).astype(dt)
    tp = _edge_tap_tensor(k_pole).astype(dt)
    cq = _corner_taps(k_eq).astype(dt)
    cp = _corner_taps(k_pole).astype(dt)
    kernel = functools.partial(_ring_kernel, n=n, cin=cin)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fixes, cor = pl.pallas_call(
        kernel,
        grid=(6,),
        in_specs=[
            pl.BlockSpec((b, 1, 4, n + 2, cin), lambda f: (0, f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full, full, full,
        ],
        out_specs=(
            pl.BlockSpec((b, 1, 4, n, d), lambda f: (0, f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, 1, 4 * d), lambda f: (0, f, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 6, 4, n, d), dt),
            jax.ShapeDtypeStruct((b, 6, 1, 4 * d), dt),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 6 * (4 * n * 3 + 4) * cin * d,
            bytes_accessed=2 * ext.size * ext.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ext, tq, tp, cq, cp)
    return fixes, cor.reshape(b, 6, 4, d)


def ring_apply(base, fixes, corners):
    """Masked perimeter add: fixes on the boundary ring, corner
    double-counts subtracted — elementwise only, fused by XLA into one
    pass over ``base`` (the SAME-conv output)."""
    n = base.shape[2]
    row = lax.broadcasted_iota(jnp.int32, (n, n), 0)[None, None, :, :, None]
    col = lax.broadcasted_iota(jnp.int32, (n, n), 1)[None, None, :, :, None]
    zero = jnp.zeros((), base.dtype)
    fix_s, fix_n = fixes[:, :, 0], fixes[:, :, 1]
    fix_w, fix_e = fixes[:, :, 2], fixes[:, :, 3]
    c_sw, c_se = corners[:, :, 0], corners[:, :, 1]
    c_nw, c_ne = corners[:, :, 2], corners[:, :, 3]
    return (
        base
        + jnp.where(row == 0, fix_s[:, :, None, :, :], zero)
        + jnp.where(row == n - 1, fix_n[:, :, None, :, :], zero)
        + jnp.where(col == 0, fix_w[:, :, :, None, :], zero)
        + jnp.where(col == n - 1, fix_e[:, :, :, None, :], zero)
        - jnp.where((row == 0) & (col == 0), c_sw[:, :, None, None, :], zero)
        - jnp.where((row == 0) & (col == n - 1), c_se[:, :, None, None, :], zero)
        - jnp.where((row == n - 1) & (col == 0), c_nw[:, :, None, None, :], zero)
        - jnp.where(
            (row == n - 1) & (col == n - 1), c_ne[:, :, None, None, :], zero
        )
    )


def _fused_kernel(beq_ref, bpo_ref, ext_ref, tq_ref, tp_ref, cq_ref, cp_ref,
                  out_ref, *, n, cin):
    """Fused select + ring apply for one (batch-chunk, face) block.

    Inputs: the TWO full-face SAME-conv outputs (equatorial / polar
    weights), the ghost strips, and the tap matrices.  The block's output
    is ``select(base) + masked ring`` — the fix dots AND the boundary
    masked-add happen in VMEM (value-level ``where`` adds; sublane-indexed
    column STORES are the thing Mosaic cannot lower for 16-bit, value ops
    are fine — same trick as ops.pallas_conv._kernel).
    """
    import jax.lax as lax

    d = cq_ref.shape[-1]
    bb = ext_ref.shape[0]
    f = pl.program_id(1)
    is_eq = f < 4
    base = jnp.where(is_eq, beq_ref[:, 0], bpo_ref[:, 0])  # (bb, n, n, D)
    acc = base.astype(jnp.float32)
    row = lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)[None]
    col = lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)[None]
    masks = (row == 0, row == n - 1, col == 0, col == n - 1)
    fixes = []
    for e in range(4):
        strips = ext_ref[:, 0, e]  # (bb, n+2, Cin)
        fe = jnp.zeros((bb * n, d), jnp.float32)
        for dy in range(3):
            taps = jnp.where(is_eq, tq_ref[e, dy], tp_ref[e, dy])  # (Cin, D)
            fe += jax.lax.dot_general(
                strips[:, dy : dy + n, :].reshape(bb * n, cin), taps,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        fixes.append(fe.reshape(bb, n, d))
    # S/N fixes broadcast along columns, W/E along rows
    acc += jnp.where(masks[0], fixes[0][:, None, :, :], 0.0)
    acc += jnp.where(masks[1], fixes[1][:, None, :, :], 0.0)
    acc += jnp.where(masks[2], fixes[2][:, :, None, :], 0.0)
    acc += jnp.where(masks[3], fixes[3][:, :, None, :], 0.0)
    # corner double-counts, subtracted at the four corner cells
    s_rows = ext_ref[:, 0, 0]
    n_rows = ext_ref[:, 0, 1]
    srcs = (s_rows[:, 0], s_rows[:, n + 1], n_rows[:, 0], n_rows[:, n + 1])
    cmasks = (
        masks[0] & masks[2], masks[0] & masks[3],
        masks[1] & masks[2], masks[1] & masks[3],
    )
    for ci, (src, cm) in enumerate(zip(srcs, cmasks)):
        ct = jnp.where(is_eq, cq_ref[ci], cp_ref[ci])  # (Cin, D)
        cor = jax.lax.dot_general(
            src, ct,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bb, D)
        acc -= jnp.where(cm, cor[:, None, None, :], 0.0)
    out_ref[:, 0] = acc.astype(out_ref.dtype)


def _batch_chunk(b: int, n: int, d: int, cin: int, dtype_bytes: int) -> int:
    """Largest batch chunk whose fused-kernel VMEM blocks (2 bases + ext +
    out, double-buffered) stay within ~8 MB."""
    per_item = (3 * n * n * d + 4 * (n + 2) * cin) * dtype_bytes * 2
    per_item += n * n * d * 4  # f32 acc
    bb = b
    while bb > 1 and bb * per_item > 8 * 2**20:
        bb //= 2
    while b % bb:
        bb -= 1
    return max(bb, 1)


def xring_fused_apply(base_eq, base_po, ext, k_eq, k_pole, *,
                      interpret: bool = False):
    """select(base) + ring correction in ONE kernel (select + fix dots +
    masked apply fused; replaces ring_fixes_pallas + ring_apply + the XLA
    face select, whose separate passes measured 142 + ~40 us at C48)."""
    b, nf, n, _, d = base_eq.shape
    cin = ext.shape[-1]
    dt = base_eq.dtype
    tq = _edge_tap_tensor(k_eq).astype(dt)
    tp = _edge_tap_tensor(k_pole).astype(dt)
    cq = _corner_taps(k_eq).astype(dt)
    cp = _corner_taps(k_pole).astype(dt)
    bb = _batch_chunk(b, n, d, cin, jnp.dtype(dt).itemsize)
    kernel = functools.partial(_fused_kernel, n=n, cin=cin)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def blk(shape):
        return pl.BlockSpec(shape, lambda i, f: (i,) + (f,) + (0,) * (len(shape) - 2),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b // bb, 6),
        in_specs=[
            blk((bb, 1, n, n, d)),
            blk((bb, 1, n, n, d)),
            blk((bb, 1, 4, n + 2, cin)),
            full, full, full, full,
        ],
        out_specs=blk((bb, 1, n, n, d)),
        out_shape=jax.ShapeDtypeStruct((b, 6, n, n, d), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 6 * (4 * n * 3 + 4) * cin * d,
            bytes_accessed=3 * base_eq.size * jnp.dtype(dt).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(base_eq, base_po, ext, tq, tp, cq, cp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def cs_conv3x3_xring(x, k_eq, k_pole, b_eq, b_pole, interpret=False,
                     backward="split"):
    """CS conv, 3x3/stride-1: XLA SAME conv + Pallas ring kernel.

    Same map as ``cs_conv3x3_ringfix`` / ``cs_pad`` + VALID conv; biases
    required (pass zeros) so the VJP signature stays static.  ``backward``:
    ``"split"`` (hand-derived boundary-slice cotangents — SAME-conv VJP +
    explicit ring transpose + Eᵀ fold; grad-equivalence-tested) or
    ``"ringfix"`` (the packed composition VJP the Pallas-kernel path uses).
    """
    return _xring_forward(x, k_eq, k_pole, b_eq, b_pole, interpret)


def _xring_forward(x, k_eq, k_pole, b_eq, b_pole, interpret):
    # dual base: TWO full 6-face convs — the face-slice + concat structure
    # measured 437 us/conv at n=48/c=32 vs 105.7 for dual convs + select
    # (tools/groupconv_micro.py); the select happens inside the fused
    # kernel, which also applies the ring correction in VMEM.
    base_eq = _same_conv(x, k_eq)
    base_po = _same_conv(x, k_pole)
    ext = ext_strips(x)
    out = xring_fused_apply(base_eq, base_po, ext, k_eq, k_pole,
                            interpret=interpret)
    return add_group_bias(out, b_eq, b_pole)


def _xring_fwd(x, k_eq, k_pole, b_eq, b_pole, interpret, backward):
    out = _xring_forward(x, k_eq, k_pole, b_eq, b_pole, interpret)
    return out, (x, k_eq, k_pole, b_eq, b_pole)


def _boundary_cotangents(g):
    """Cotangents of (fixes, corners) under :func:`ring_apply`: the fix
    strips receive g's boundary lines (+), the corners receive g's corner
    cells (−).  Pure slices — no where-VJP select passes."""
    n = g.shape[2]
    d_fix = jnp.stack(
        [g[:, :, 0, :, :], g[:, :, n - 1, :, :],
         g[:, :, :, 0, :], g[:, :, :, n - 1, :]],
        axis=2,
    )  # (B, 6, 4, n, D) in [S, N, W, E] order
    d_cor = -jnp.stack(
        [g[:, :, 0, 0], g[:, :, 0, n - 1],
         g[:, :, n - 1, 0], g[:, :, n - 1, n - 1]],
        axis=2,
    )  # (B, 6, 4, D) in [sw, se, nw, ne] order
    return d_fix, d_cor


def _ring_transpose_xla(ext, d_fix, d_cor, k_eq, k_pole):
    """Transpose of (ext, taps) -> (fixes, corners): returns
    ``(d_ext, dk_eq, dk_pole)`` where dk are full (3, 3, Cin, D) kernel
    cotangents of the RING's tap usage (the SAME-conv dw adds separately).

    All contractions are single dot_generals; the window transpose is three
    shifted pads (scatter-free); tap gradients assemble by stacking slices.
    """
    b, _, _, np2, cin = ext.shape
    n = np2 - 2
    d = d_fix.shape[-1]
    dt = ext.dtype
    d_fix = d_fix.astype(dt)
    d_cor = d_cor.astype(dt)

    def group(vals, eq):  # face split helper
        return vals[:, :4] if eq else vals[:, 4:]

    def edge_tap_mats(k):  # (4, 3C, D)
        return jnp.stack(
            [k[0].reshape(3 * cin, d), k[2].reshape(3 * cin, d),
             k[:, 0].reshape(3 * cin, d), k[:, 2].reshape(3 * cin, d)],
            axis=0,
        ).astype(dt)

    def windows_of(ext_g):
        win = jnp.stack(
            [ext_g[..., 0:n, :], ext_g[..., 1:n + 1, :], ext_g[..., 2:n + 2, :]],
            axis=-2,
        )
        return win.reshape(ext_g.shape[0], ext_g.shape[1], 4, n, 3 * cin)

    d_ext_groups = []
    dk_ring = []
    for eq, k in ((True, k_eq), (False, k_pole)):
        taps = edge_tap_mats(k)  # (4, 3C, D)
        dfg = group(d_fix, eq)  # (B, F, 4, n, D)
        # d_win = d_fix @ taps^T, batched over the edge dim
        d_win = lax.dot_general(
            dfg, taps,
            dimension_numbers=(((4,), (2,)), ((2,), (0,))),
        )  # (4, B, F, n, 3C)
        d_win = jnp.moveaxis(d_win, 0, 2)  # (B, F, 4, n, 3C)
        d_win = d_win.reshape(d_win.shape[:4] + (3, cin))
        # window transpose: strip position s receives d_win[t, dy] for
        # every (t, dy) with t + dy == s — three shifted zero-pads.
        d_ext_g = (
            jnp.pad(d_win[..., 0, :], ((0, 0),) * 3 + ((0, 2), (0, 0)))
            + jnp.pad(d_win[..., 1, :], ((0, 0),) * 3 + ((1, 1), (0, 0)))
            + jnp.pad(d_win[..., 2, :], ((0, 0),) * 3 + ((2, 0), (0, 0)))
        )  # (B, F, 4, n+2, Cin)
        # corner transpose: ends of the S/N strips fed the corner dot.
        ck = jnp.stack(
            [k[0, 0], k[0, 2], k[2, 0], k[2, 2]], axis=0
        ).astype(dt)  # (4, C, D)
        dcg = group(d_cor, eq)  # (B, F, 4, D)
        d_csrc = lax.dot_general(
            dcg, ck,
            dimension_numbers=(((3,), (2,)), ((2,), (0,))),
        )  # (4, B, F, C)
        d_csrc = jnp.moveaxis(d_csrc, 0, 2)  # (B, F, 4, C) [sw, se, nw, ne]
        # S strip ends: positions 0 (sw) and n+1 (se); N: 0 (nw), n+1 (ne);
        # one zero-padded add onto the strip tensor (rows W/E untouched).
        sw, se, nw, ne = (d_csrc[:, :, i] for i in range(4))
        s_line = jnp.pad(sw[:, :, None, :], ((0, 0), (0, 0), (0, n + 1), (0, 0))) \
            + jnp.pad(se[:, :, None, :], ((0, 0), (0, 0), (n + 1, 0), (0, 0)))
        n_line = jnp.pad(nw[:, :, None, :], ((0, 0), (0, 0), (0, n + 1), (0, 0))) \
            + jnp.pad(ne[:, :, None, :], ((0, 0), (0, 0), (n + 1, 0), (0, 0)))
        ends = jnp.stack(
            [s_line, n_line,
             jnp.zeros_like(s_line), jnp.zeros_like(s_line)],
            axis=2,
        )
        d_ext_groups.append(d_ext_g + ends)

        # ---- tap gradients (ring part) -----------------------------------
        win = windows_of(group(ext, eq))  # (B, F, 4, n, 3C)
        d_taps = lax.dot_general(
            win, dfg,
            dimension_numbers=(((1, 3), (1, 3)), ((0, 2), (0, 2))),
        )  # (B, 4, 3C, D) -> contracted over F, n... see dims below
        # dims: batch (0->B? ) — contract (F=1, n=3) batch (B=0, e=2):
        # result (B, 4, 3C, D); reduce remaining batch over B
        d_taps = jnp.sum(d_taps, axis=0).reshape(4, 3, cin, d)
        csrc = jnp.stack(
            [group(ext, eq)[:, :, 0, 0], group(ext, eq)[:, :, 0, n + 1],
             group(ext, eq)[:, :, 1, 0], group(ext, eq)[:, :, 1, n + 1]],
            axis=2,
        )  # (B, F, 4, C)
        d_ck = lax.dot_general(
            csrc, dcg,
            dimension_numbers=(((0, 1), (0, 1)), ((2,), (2,))),
        )  # (4, C, D)
        # assemble the full (3, 3, C, D) ring-tap cotangent: edge taps map
        # to k's outside row/col; corner taps overlap them at the corners.
        dS, dN, dW, dE = (d_taps[i] for i in range(4))  # each (3, C, D)
        dsw, dse, dnw, dne = (d_ck[i] for i in range(4))
        z = jnp.zeros_like(dS[0])
        row0 = jnp.stack([dS[0] + dW[0] + dsw, dS[1], dS[2] + dE[0] + dse])
        row1 = jnp.stack([dW[1], z, dE[1]])
        row2 = jnp.stack([dN[0] + dW[2] + dnw, dN[1], dN[2] + dE[2] + dne])
        dk_ring.append(jnp.stack([row0, row1, row2], axis=0))
    d_ext = jnp.concatenate(d_ext_groups, axis=1)
    return d_ext, dk_ring[0], dk_ring[1]


def split_vjp(x, k_eq, k_pole, b_eq, b_pole, g):
    """Hand-derived VJP of the CS conv linear map: SAME-conv VJP (XLA's
    own, fast unpacked) + explicit ring transpose + scatter-free Eᵀ fold.

    Valid for ANY forward that computes the same map (xring, the fused
    Pallas kernel, ring-fix) — returns ``(dx, dk_eq, dk_pole, db_eq,
    db_pole)``.  Grad-equivalence pinned against the pad path.
    """
    from dlwp_cs_tpu.ops.halo import _ext_transpose

    g = g.astype(x.dtype)

    def base_of(v, ke, kp):
        return jnp.concatenate(
            [_same_conv(v[:, :4], ke), _same_conv(v[:, 4:], kp)], axis=1
        )

    _, pull_base = jax.vjp(base_of, x, k_eq, k_pole)
    dx_base, dk_eq_base, dk_po_base = pull_base(g)
    # ring part: boundary-slice cotangents -> strip-space transpose -> Eᵀ
    ext = ext_strips(x)
    d_fix, d_cor = _boundary_cotangents(g)
    d_ext, dk_eq_ring, dk_po_ring = _ring_transpose_xla(
        ext, d_fix, d_cor, k_eq, k_pole
    )
    dx = dx_base + _ext_transpose(d_ext)
    g32 = g.astype(jnp.float32)
    db_eq = jnp.sum(g32[:, :4], axis=(0, 1, 2, 3)).astype(b_eq.dtype)
    db_po = jnp.sum(g32[:, 4:], axis=(0, 1, 2, 3)).astype(b_pole.dtype)
    return (
        dx,
        dk_eq_base + dk_eq_ring.astype(dk_eq_base.dtype),
        dk_po_base + dk_po_ring.astype(dk_po_base.dtype),
        db_eq,
        db_po,
    )


def _xring_bwd(interpret, backward, res, g):
    x, k_eq, k_pole, b_eq, b_pole = res
    if backward == "ringfix":
        from dlwp_cs_tpu.ops.ringfix import cs_conv3x3_ringfix

        _, pullback = jax.vjp(
            lambda *a: cs_conv3x3_ringfix(a[0], a[1], a[2], bias_eq=a[3],
                                          bias_pole=a[4]),
            x, k_eq, k_pole, b_eq, b_pole,
        )
        return pullback(g)
    if backward != "split":
        raise ValueError(f"unknown xring backward {backward!r}")
    return split_vjp(x, k_eq, k_pole, b_eq, b_pole, g)


cs_conv3x3_xring.defvjp(_xring_fwd, _xring_bwd)
