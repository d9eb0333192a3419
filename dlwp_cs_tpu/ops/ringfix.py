"""Ring-fix cubed-sphere convolution: SAME conv + O(perimeter) halo fix.

The fastest formulation found for 3x3/stride-1 CS convolution on TPU.
Observation: a zero-padded 'SAME' convolution is XLA's best-tuned path and
already produces correct outputs everywhere except the 1-cell output ring of
each face, where taps fall outside the face.  So:

    out = conv_SAME_zero(x)  +  ring_fix(halo strips, kernel)

The fix adds, for each face edge, the contribution of the (corner-extended)
ghost strip through the kernel's outside column/row — a batched
``(n, 3*Cin) @ (3*Cin, Cout)`` matmul per edge plus four rank-1 corner
de-duplications (the corner ghost enters via both flanking edges).  Total
extra work is O(perimeter * 9 * Cin * Cout / n) of the conv's FLOPs (~6% at
C48) and, unlike the pad-materializing path, no O(n^2) intermediate is ever
written to HBM.

Everything is plain XLA (differentiable for free, works in bf16); pinned
exactly equal to the ``cs_pad`` + VALID conv reference by tests.
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


def _same_conv(xg, kernel):
    """Zero-padded SAME conv on a face group folded into batch."""
    b, f = xg.shape[0], xg.shape[1]
    merged = xg.reshape((b * f,) + xg.shape[2:])
    out = lax.conv_general_dilated(
        merged,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_DIMSPEC,
        preferred_element_type=merged.dtype,
    )
    return out.reshape((b, f) + out.shape[1:])


def _edge_windows(ext):
    """(..., n+2, C) corner-extended strip -> (..., n, 3, C) tap windows."""
    n = ext.shape[-2] - 2
    return jnp.stack([ext[..., 0:n, :], ext[..., 1 : n + 1, :], ext[..., 2 : n + 2, :]], axis=-2)


def cs_conv3x3_ringfix(x, k_eq, k_pole, *, bias_eq=None, bias_pole=None):
    """Fused CS conv, 3x3/stride-1: ``(B, 6, n, n, Cin) -> (B, 6, n, n, Cout)``.

    Exactly equivalent to ``cs_pad(x, 1)`` + per-group VALID conv (same
    corner-averaging halo semantics), at near-SAME-conv cost.
    """
    b, nf, n, n2, cin = x.shape
    if nf != 6 or n != n2:
        raise ValueError(f"expected (B, 6, n, n, C), got {x.shape}")
    cout = k_eq.shape[-1]

    base_eq = _same_conv(x[:, :4], k_eq)
    base_po = _same_conv(x[:, 4:], k_pole)
    out = jnp.concatenate([base_eq, base_po], axis=1)

    strips = gather_halo_strips(x)  # (B, 6, 4, n, C) oriented [t]
    s_strip = strips[:, :, EDGE_S]
    n_strip = strips[:, :, EDGE_N]
    w_strip = strips[:, :, EDGE_W]
    e_strip = strips[:, :, EDGE_E]
    # corner ghosts (B, 6, C): average of flanking edge-ghost ends
    sw = 0.5 * (s_strip[:, :, 0] + w_strip[:, :, 0])
    se = 0.5 * (s_strip[:, :, -1] + e_strip[:, :, 0])
    nw = 0.5 * (n_strip[:, :, 0] + w_strip[:, :, -1])
    ne = 0.5 * (n_strip[:, :, -1] + e_strip[:, :, -1])

    def extend(strip, c_lo, c_hi):
        return jnp.concatenate(
            [c_lo[:, :, None], strip, c_hi[:, :, None]], axis=2
        )  # (B, 6, n+2, C)

    # Per-face-group kernels stacked along the face axis: (6, ...) selector.
    def kgroup(sel):
        """kernel tap stack (6, 3, Cin, Cout) for slice sel of the kernel."""
        ke = k_eq[sel]  # (3, Cin, Cout) ordered along the edge direction
        kp = k_pole[sel]
        return jnp.stack([ke] * 4 + [kp] * 2, axis=0)

    def fix(ext, taps):
        """ext (B, 6, n+2, C), taps (6, 3, Cin, Cout) -> (B, 6, n, Cout)."""
        win = _edge_windows(ext)  # (B, 6, n, 3, C)
        return jnp.einsum("bfntc,ftcd->bfnd", win, taps.astype(ext.dtype))

    # W edge (output col 0): missing kernel column dx=0 -> taps K[dy, 0].
    fix_w = fix(extend(w_strip, sw, nw), kgroup((slice(None), 0)))
    out = out.at[:, :, :, 0, :].add(fix_w)
    # E edge (output col n-1): taps K[dy, 2].
    fix_e = fix(extend(e_strip, se, ne), kgroup((slice(None), 2)))
    out = out.at[:, :, :, n - 1, :].add(fix_e)
    # S edge (output row 0): taps K[0, dx].
    fix_s = fix(extend(s_strip, sw, se), kgroup((0, slice(None))))
    out = out.at[:, :, 0, :, :].add(fix_s)
    # N edge (output row n-1): taps K[2, dx].
    fix_n = fix(extend(n_strip, nw, ne), kgroup((2, slice(None))))
    out = out.at[:, :, n - 1, :, :].add(fix_n)

    # Corner tap double-count: each corner ghost entered via both edges.
    def kcorner(dy, dx):
        return jnp.stack([k_eq[dy, dx]] * 4 + [k_pole[dy, dx]] * 2, axis=0)

    def corner_fix(ghost, dy, dx):
        return jnp.einsum("bfc,fcd->bfd", ghost, kcorner(dy, dx).astype(ghost.dtype))

    out = out.at[:, :, 0, 0, :].add(-corner_fix(sw, 0, 0))
    out = out.at[:, :, 0, n - 1, :].add(-corner_fix(se, 0, 2))
    out = out.at[:, :, n - 1, 0, :].add(-corner_fix(nw, 2, 0))
    out = out.at[:, :, n - 1, n - 1, :].add(-corner_fix(ne, 2, 2))

    if bias_eq is not None:
        out = out.at[:, :4].add(bias_eq)
    if bias_pole is not None:
        out = out.at[:, 4:].add(bias_pole)
    return out
