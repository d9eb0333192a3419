"""Ring-fix cubed-sphere convolution: the fast fused 3x3 path.

The fastest formulation found for 3x3/stride-1 CS convolution on TPU
(measured against the pad-materializing path and a VMEM-fused Pallas kernel
— see memory/tpu-perf-findings):

1. Concatenate the two *ghost columns* (W/E halo strips) onto the width
   axis — one O(2/n) copy — and run the convolution with column padding
   VALID / row padding zero.  Every output column is then exact; only the
   first/last output *rows* miss their outside-row taps.
2. Add the missing row contributions: for each face, a corner-extended
   ghost-row strip contracted with the kernel's outside row — a tiny batched
   ``(n+2, C) -> (n, Cout)`` windowed matmul — applied with a single row
   concat (no scatter; an earlier version used 8 ``at[].add`` updates and
   spent more time scattering than convolving).

Everything is plain XLA: differentiable for free, bf16-native, and exactly
equal (up to summation order) to ``cs_pad`` + VALID conv, pinned by
tests/test_ringfix.py.

Reference parity: CubeSpherePadding2D + CubeSphereConv2D fused
(``DLWP/custom.py`` — SURVEY.md §2 rows 1-2).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.geometry.cubed_sphere import EDGE_E, EDGE_N, EDGE_S, EDGE_W
from dlwp_cs_tpu.ops.pallas_conv import gather_halo_strips

__all__ = ["cs_conv3x3_ringfix"]

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _group_conv_rows_padded(xg, kernel):
    """Conv a face group: rows zero-padded (1,1), cols VALID."""
    b, f = xg.shape[0], xg.shape[1]
    merged = xg.reshape((b * f,) + xg.shape[2:])
    out = lax.conv_general_dilated(
        merged,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (0, 0)),
        dimension_numbers=_DIMSPEC,
        preferred_element_type=merged.dtype,
    )
    return out.reshape((b, f) + out.shape[1:])


def _row_fix(ext, taps):
    """Contract corner-extended ghost rows with the kernel's outside row.

    ``ext``: (B, 6, n+2, C); ``taps``: (6, 3, Cin, Cout) per-face kernels
    (dx-ordered).  Returns (B, 6, n, Cout).
    """
    n = ext.shape[-2] - 2
    win = jnp.stack(
        [ext[..., 0:n, :], ext[..., 1 : n + 1, :], ext[..., 2 : n + 2, :]],
        axis=-2,
    )  # (B, 6, n, 3, C)
    return jnp.einsum("bfntc,ftcd->bfnd", win, taps.astype(ext.dtype))


def cs_conv3x3_ringfix(x, k_eq, k_pole, *, bias_eq=None, bias_pole=None):
    """Fused CS conv, 3x3/stride-1: ``(B, 6, n, n, Cin) -> (B, 6, n, n, Cout)``.

    Exactly equivalent to ``cs_pad(x, 1)`` + per-group VALID conv (same
    corner-averaging halo semantics), at near-plain-conv cost.
    """
    b, nf, n, n2, cin = x.shape
    if nf != 6 or n != n2:
        raise ValueError(f"expected (B, 6, n, n, C), got {x.shape}")

    strips = gather_halo_strips(x)  # (B, 6, 4, n, C) oriented [t]
    s_strip = strips[:, :, EDGE_S]
    n_strip = strips[:, :, EDGE_N]
    w_strip = strips[:, :, EDGE_W]
    e_strip = strips[:, :, EDGE_E]

    # 1. ghost columns onto the width axis; conv handles all column taps.
    xp = jnp.concatenate(
        [w_strip[:, :, :, None, :], x, e_strip[:, :, :, None, :]], axis=3
    )  # (B, 6, n, n+2, C)
    # Weight groups as base + polar correction: ONE six-face conv with k_eq
    # plus a 2-face conv with (k_pole - k_eq) — measured faster than two
    # group convs (the 2-face call under-utilizes; one big call + one small
    # beats two medium).
    base = _group_conv_rows_padded(xp, k_eq)
    pole_fix = _group_conv_rows_padded(xp[:, 4:], k_pole - k_eq)
    out = jnp.concatenate([base[:, :4], base[:, 4:] + pole_fix], axis=1)

    # 2. missing outside-row taps for the first/last output rows.
    # corner ghosts (B, 6, C): average of flanking edge-ghost ends
    sw = 0.5 * (s_strip[:, :, 0] + w_strip[:, :, 0])
    se = 0.5 * (s_strip[:, :, -1] + e_strip[:, :, 0])
    nw = 0.5 * (n_strip[:, :, 0] + w_strip[:, :, -1])
    ne = 0.5 * (n_strip[:, :, -1] + e_strip[:, :, -1])
    s_ext = jnp.concatenate([sw[:, :, None], s_strip, se[:, :, None]], axis=2)
    n_ext = jnp.concatenate([nw[:, :, None], n_strip, ne[:, :, None]], axis=2)

    def row_taps(dy):
        return jnp.stack([k_eq[dy]] * 4 + [k_pole[dy]] * 2, axis=0)

    fix_s = _row_fix(s_ext, row_taps(0))  # (B, 6, n, Cout)
    fix_n = _row_fix(n_ext, row_taps(2))
    out = jnp.concatenate(
        [
            (out[:, :, 0] + fix_s)[:, :, None],
            out[:, :, 1 : n - 1],
            (out[:, :, n - 1] + fix_n)[:, :, None],
        ],
        axis=2,
    )

    if bias_eq is not None or bias_pole is not None:
        zeros = jnp.zeros(out.shape[-1], out.dtype)
        b_eq = zeros if bias_eq is None else bias_eq
        b_po = zeros if bias_pole is None else bias_pole
        bias = jnp.stack([b_eq] * 4 + [b_po] * 2, axis=0)  # (6, Cout)
        out = out + bias[None, :, None, None, :].astype(out.dtype)
    return out
