"""Ring-fix cubed-sphere convolution: the fast fused 3x3 path.

The fastest formulation found for 3x3/stride-1 CS convolution on TPU
(measured against a pad-materializing path, a VMEM-fused Pallas kernel, and
concat/scatter variants — see memory/tpu-perf-findings):

1. Zero-padded 'SAME' convolution — XLA's best-tuned path, with the weight
   groups computed as one four-face conv with the equatorial kernel plus a
   two-face polar conv (one big call + one small call measured faster than
   padded-group alternatives).
2. The halo enters as four per-edge fix vectors — the corner-extended ghost
   strips from :func:`dlwp_cs_tpu.ops.halo.ext_strips` contracted with the
   kernel's outside row/column (tiny batched matmuls) — applied in a SINGLE
   fused elementwise pass over the output using boundary masks.  No scatter
   (``at[].add``), no concat along minor axes: both were measured to cost
   more than the convolution itself via full-tensor relayouts.

Backward matters as much as forward for training: every op here has a
scatter-free VJP — convs differentiate to convs, dots to dots, masks to
selects, and the one gather (inside ``ext_strips``) carries a custom
transpose-gather VJP.  The full train step's HLO contains zero scatters
(pinned by tests/test_ringfix.py).

Everything is plain XLA: differentiable, bf16-native, and exactly equal (up
to summation order) to ``cs_pad`` + VALID conv, pinned by tests.

Reference parity: CubeSpherePadding2D + CubeSphereConv2D fused
(``DLWP/custom.py`` — SURVEY.md §2 rows 1-2).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.geometry.cubed_sphere import EDGE_E, EDGE_N, EDGE_S, EDGE_W
from dlwp_cs_tpu.ops.halo import ext_strips

__all__ = [
    "cs_conv3x3_ringfix",
    "face_select",
    "ring_term",
    "use_base_mode",
    "use_packed_base",
]

# Batch->lane packing of the base SAME convs (ops.packing).  Default None =
# AUTO: pack under the same trace-time condition as the fused Pallas
# dispatch (single-device TPU or a shard_local_region) — there the training
# backward runs through this composition and pack(x) CSE-shares with the
# Pallas forward's pack, measured 12.75 vs 13.16 ms flagship train step.
# (An earlier measurement taken BEFORE the ext-strips CSE ordering fix
# showed a regression; PERF.md tells the story.)  GSPMD multi-device paths
# stay unpacked: the pack reshape merges batch entries across shard
# boundaries.  True/False force it either way (ablation knob).
_PACK_BASE: contextvars.ContextVar = contextvars.ContextVar(
    "ringfix_pack_base", default=None
)


@contextlib.contextmanager
def use_packed_base(enabled: bool | None = True):
    """Within this trace, ring-fix base convs run batch->lane packed
    (``True``/``False`` force; ``None`` restores the AUTO default)."""
    token = _PACK_BASE.set(enabled)
    try:
        yield
    finally:
        _PACK_BASE.reset(token)


def _pack_base_enabled() -> bool:
    flag = _PACK_BASE.get()
    if flag is not None:
        return flag
    from dlwp_cs_tpu.ops.conv import _on_tpu, _pad_impl_installed

    return _on_tpu() and not _pad_impl_installed()

# Base-conv structure: "split" (slice faces 0:4 / 4:6, conv each, concat —
# the original) or "dual" (TWO full 6-face convs + masked face select).
# tools/groupconv_micro.py (differenced chains, v5e): the split/concat
# structure costs 437 us at n=48/c=32 where dual is 105.7 — the face slice
# + concat relayouts, not the convs, dominate; dual's 1.5x extra conv
# FLOPs are cheap at these shapes.  None = AUTO (currently "dual" on the
# unpacked path, "split" on the packed one — packed block-diag convs are
# wide enough that the 2x full-width dual convs lose their advantage;
# measured in tools/bwdcomp_micro.py).
_BASE_MODE: contextvars.ContextVar = contextvars.ContextVar(
    "ringfix_base_mode", default=None
)


@contextlib.contextmanager
def use_base_mode(mode: str | None):
    """Within this trace, ring-fix base convs use ``mode`` ('split' |
    'dual'; ``None`` restores AUTO)."""
    if mode not in (None, "split", "dual"):
        raise ValueError(f"unknown ringfix base mode {mode!r}")
    token = _BASE_MODE.set(mode)
    try:
        yield
    finally:
        _BASE_MODE.reset(token)


def face_select(eq_out, po_out):
    """Per-face weight-group select: faces 0-3 take ``eq_out``, 4-5
    ``po_out`` — one fused elementwise pass."""
    face = lax.broadcasted_iota(jnp.int32, (6, 1, 1, 1), 0)[None]
    return jnp.where(face < 4, eq_out, po_out)

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _same_conv(xg, kernel, preferred_element_type=None):
    """Zero-padded SAME conv with faces folded into batch.  The accumulator
    type defaults to the input dtype; the int8 path (ops.quant) passes s32."""
    b, f = xg.shape[0], xg.shape[1]
    merged = xg.reshape((b * f,) + xg.shape[2:])
    out = lax.conv_general_dilated(
        merged,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMSPEC,
        preferred_element_type=preferred_element_type or merged.dtype,
    )
    return out.reshape((b, f) + out.shape[1:])


def cs_conv3x3_ringfix(x, k_eq, k_pole, *, bias_eq=None, bias_pole=None):
    """Fused CS conv, 3x3/stride-1: ``(B, 6, n, n, Cin) -> (B, 6, n, n, Cout)``.

    Exactly equivalent to ``cs_pad(x, 1)`` + per-group VALID conv (same
    corner-averaging halo semantics), at near-plain-conv cost.
    """
    b, nf, n, n2, cin = x.shape
    if nf != 6 or n != n2:
        raise ValueError(f"expected (B, 6, n, n, C), got {x.shape}")

    # 1. base conv per weight group (two calls measured cheaper than one
    # six-face call plus a polar correction conv); optionally batch->lane
    # packed (use_packed_base — see the contextvar note above).
    if _pack_base_enabled():
        # SAME pack factor (incl. the VMEM gate) as the fused Pallas
        # forward dispatch: the training backward runs this composition on
        # identical shapes, and only identical pack ops CSE-share.
        from dlwp_cs_tpu.ops.pallas_conv import _pack_factor

        p = _pack_factor(b, n, cin, k_eq.shape[-1],
                         jnp.dtype(x.dtype).itemsize)
    else:
        p = 1
    mode = _BASE_MODE.get()
    if mode is None:
        mode = "split" if p > 1 else "dual"
    if p > 1:
        # FULLY packed composition: base convs, ghost-strip gather and fix
        # contractions all run in the packed layout; one unpack at the end.
        from dlwp_cs_tpu.ops import packing

        xp = packing.pack_batch(x, p)
        ke_p = packing.block_diag_taps(k_eq, p)
        kp_p = packing.block_diag_taps(k_pole, p)
        if mode == "dual":
            out = face_select(_same_conv(xp, ke_p), _same_conv(xp, kp_p))
        else:
            out = jnp.concatenate(
                [_same_conv(xp[:, :4], ke_p), _same_conv(xp[:, 4:], kp_p)],
                axis=1,
            )
        out = out + ring_term(xp, k_eq, k_pole, pack=p)
        out = packing.unpack_batch(out, p)
    else:
        if mode == "dual":
            out = face_select(_same_conv(x, k_eq), _same_conv(x, k_pole))
        else:
            out = jnp.concatenate(
                [_same_conv(x[:, :4], k_eq), _same_conv(x[:, 4:], k_pole)],
                axis=1,
            )
        out = out + ring_term(x, k_eq, k_pole)
    return add_group_bias(out, bias_eq, bias_pole)


def add_group_bias(out, bias_eq, bias_pole):
    """Add per-weight-group biases to ``(B, 6, ..., Cout)`` conv output
    (equatorial faces 0-3, polar faces 4-5); no-op when both are None.
    Shared by every conv formulation (ring-fix, pad-path, sharded band)."""
    if bias_eq is None and bias_pole is None:
        return out
    zeros = jnp.zeros(out.shape[-1], out.dtype)
    b_eq = zeros if bias_eq is None else bias_eq
    b_po = zeros if bias_pole is None else bias_pole
    bias = jnp.stack([b_eq] * 4 + [b_po] * 2, axis=0)  # (6, Cout)
    shape = (1, 6) + (1,) * (out.ndim - 3) + (out.shape[-1],)
    return out + bias.reshape(shape).astype(out.dtype)


def ring_term(x, k_eq, k_pole, pack: int = 1):
    """The halo correction: everything of the CS conv except the per-face
    zero-padded SAME convs and the bias.  Split out so a decomposed
    backward can differentiate the SAME-conv part and this part separately
    (``cs_conv3x3_ringfix == same_convs + ring_term + bias``, pinned by the
    equivalence tests).

    ``pack > 1``: ``x`` is batch->lane PACKED (``(B/p, 6, n, n, p*Cin)`` —
    ops.packing) while the kernels stay unpacked; the fix/corner taps get
    the matching block structure and the output is packed ``p*Cout``.
    Keeping the ghost-strip gather in the packed layout matters: gathering
    rows of 32 lanes costs ~165 us at n=48 where full 128-lane rows are
    ~free (tools/glue_micro.py)."""
    b, nf, n, n2, pcin = x.shape
    cin = k_eq.shape[2]
    if pcin != pack * cin:
        raise ValueError(
            f"packed channels {pcin} != pack {pack} * kernel Cin {cin}"
        )

    # corner-extended ghost strips: (B, 6, 4, n+2, C), positions 0 and
    # n+1 already the corner ghosts — one linear map, scatter-free VJP.
    # Channel-agnostic: on packed x it equals the packed unpacked-strips.
    ext = ext_strips(x)

    # All four edges in ONE batched contraction per weight group: windows
    # (B, nf, E=4, n, 3C) x taps (E=4, 3C, Cout), batched over E — eight
    # separate einsums were a measured TPU cost (per-op overhead dominates
    # at these sizes).
    win = jnp.stack(
        [ext[..., 0:n, :], ext[..., 1 : n + 1, :], ext[..., 2 : n + 2, :]],
        axis=-2,
    )  # (B, 6, 4, n, 3, pC)
    win = win.reshape(b, 6, 4, n, 3 * pcin)

    eye_p = jnp.eye(pack, dtype=k_eq.dtype) if pack > 1 else None

    def edge_taps(k):
        # taps for [row 0 fix, row n-1 fix, col 0 fix, col n-1 fix] in the
        # EDGE_S, EDGE_N, EDGE_W, EDGE_E slot order of the strips tensor
        t = jnp.stack(
            [k[0].reshape(3 * cin, -1), k[2].reshape(3 * cin, -1),
             k[:, 0].reshape(3 * cin, -1), k[:, 2].reshape(3 * cin, -1)],
            axis=0,
        )  # (4, 3C, Cout)
        if pack == 1:
            return t
        # packed win lane layout is (tap t, batch-slot i, ci): the tap
        # matrix gets delta_ij block structure on BOTH sides
        cout = t.shape[-1]
        t = t.reshape(4, 3, cin, cout)
        tb = jnp.einsum("ij,etcd->eticjd", eye_p, t)
        return tb.reshape(4, 3 * pack * cin, pack * cout)

    def group_fix(win_g, taps_g):
        # (B, nf, 4, n, 3C) x (4, 3C, D) -> (4, B, nf, n, D)
        return lax.dot_general(
            win_g,
            taps_g.astype(win_g.dtype),
            dimension_numbers=(((4,), (1,)), ((2,), (0,))),
        )

    fix_eq = group_fix(win[:, :4], edge_taps(k_eq))
    fix_po = group_fix(win[:, 4:], edge_taps(k_pole))
    fixes = jnp.concatenate([fix_eq, fix_po], axis=2)  # (4, B, 6, n, Cout)
    fix_s, fix_n, fix_w, fix_e = (fixes[i] for i in range(4))

    # Corner double-count (each corner ghost entered via both of its edges'
    # windows): one small batched contraction for all four corners.  The
    # corner ghosts are just the END positions of the S/N strips.
    sw = ext[:, :, EDGE_S, 0]
    se = ext[:, :, EDGE_S, n + 1]
    nw = ext[:, :, EDGE_N, 0]
    ne = ext[:, :, EDGE_N, n + 1]
    corners = jnp.stack([sw, se, nw, ne], axis=0)  # (4, B, 6, pC)

    def corner_taps(k):
        ck = jnp.stack([k[0, 0], k[0, 2], k[2, 0], k[2, 2]], axis=0)
        if pack == 1:
            return ck  # (4, C, Cout)
        cb = jnp.einsum("ij,ecd->eicjd", eye_p, ck)
        return cb.reshape(4, pack * cin, pack * ck.shape[-1])

    ck_eq = corner_taps(k_eq)
    ck_po = corner_taps(k_pole)
    c_eq = lax.dot_general(
        corners[:, :, :4], ck_eq.astype(corners.dtype),
        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
    )
    c_po = lax.dot_general(
        corners[:, :, 4:], ck_po.astype(corners.dtype),
        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
    )
    c_all = jnp.concatenate([c_eq, c_po], axis=2)  # (4, B, 6, Cout)
    c_sw, c_se, c_nw, c_ne = (c_all[i] for i in range(4))

    # 3. one fused masked-add pass: out[b,f,i,j,:] gains the edge fixes on
    # its boundary ring and loses the corner duplicates.  All broadcasting
    # elementwise ops — XLA fuses this with the conv output into one pass.
    row = lax.broadcasted_iota(jnp.int32, (n, n), 0)[None, None, :, :, None]
    col = lax.broadcasted_iota(jnp.int32, (n, n), 1)[None, None, :, :, None]
    zero = jnp.zeros((), fixes.dtype)
    return (
        jnp.where(row == 0, fix_s[:, :, None, :, :], zero)
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
