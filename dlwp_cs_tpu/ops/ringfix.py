"""Ring-fix cubed-sphere convolution: the fast fused 3x3 path.

The fastest formulation found for 3x3/stride-1 CS convolution on TPU
(measured against a pad-materializing path, a VMEM-fused Pallas kernel, and
concat/scatter variants — see memory/tpu-perf-findings):

1. Zero-padded 'SAME' convolution — XLA's best-tuned path, with the weight
   groups computed as one six-face conv with the equatorial kernel plus a
   small two-face *correction* conv with ``k_pole - k_eq`` (one big call +
   one small call measured faster than two medium group calls).
2. The halo enters as four per-edge fix vectors — corner-extended ghost
   strips contracted with the kernel's outside row/column (tiny batched
   matmuls) — applied in a SINGLE fused elementwise pass over the output
   using boundary masks.  No scatter (``at[].add``), no concat along minor
   axes: both were measured to cost more than the convolution itself via
   full-tensor relayouts.

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


def _same_conv(xg, kernel):
    """Zero-padded SAME conv with faces folded into batch."""
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


def _edge_fix(ext, taps):
    """Contract a corner-extended ghost strip with 3 kernel taps.

    ``ext``: (B, 6, n+2, Cin); ``taps``: (6, 3, Cin, Cout) per-face, ordered
    along the strip direction.  Returns (B, 6, n, Cout).
    """
    n = ext.shape[-2] - 2
    win = jnp.stack(
        [ext[..., 0:n, :], ext[..., 1 : n + 1, :], ext[..., 2 : n + 2, :]],
        axis=-2,
    )  # (B, 6, n, 3, Cin)
    return jnp.einsum("bfntc,ftcd->bfnd", win, taps.astype(ext.dtype))


def cs_conv3x3_ringfix(x, k_eq, k_pole, *, bias_eq=None, bias_pole=None):
    """Fused CS conv, 3x3/stride-1: ``(B, 6, n, n, Cin) -> (B, 6, n, n, Cout)``.

    Exactly equivalent to ``cs_pad(x, 1)`` + per-group VALID conv (same
    corner-averaging halo semantics), at near-plain-conv cost.
    """
    b, nf, n, n2, cin = x.shape
    if nf != 6 or n != n2:
        raise ValueError(f"expected (B, 6, n, n, C), got {x.shape}")

    # 1. base conv: k_eq everywhere + (k_pole - k_eq) correction on poles.
    base = _same_conv(x, k_eq)
    pole_fix = _same_conv(x[:, 4:], k_pole - k_eq)
    out = jnp.concatenate([base[:, :4], base[:, 4:] + pole_fix], axis=1)

    # 2. halo fix vectors from the oriented ghost strips.
    strips = gather_halo_strips(x)  # (B, 6, 4, n, C)
    s_strip = strips[:, :, EDGE_S]
    n_strip = strips[:, :, EDGE_N]
    w_strip = strips[:, :, EDGE_W]
    e_strip = strips[:, :, EDGE_E]
    # corner ghosts (B, 6, C): average of flanking edge-ghost ends
    sw = 0.5 * (s_strip[:, :, 0] + w_strip[:, :, 0])
    se = 0.5 * (s_strip[:, :, -1] + e_strip[:, :, 0])
    nw = 0.5 * (n_strip[:, :, 0] + w_strip[:, :, -1])
    ne = 0.5 * (n_strip[:, :, -1] + e_strip[:, :, -1])

    def ext(strip, lo, hi):
        return jnp.concatenate([lo[:, :, None], strip, hi[:, :, None]], axis=2)

    def taps(sel):
        return jnp.stack([k_eq[sel]] * 4 + [k_pole[sel]] * 2, axis=0)

    # Missing-tap contributions per edge (kernel row dy / column dx outside).
    fix_s = _edge_fix(ext(s_strip, sw, se), taps((0, slice(None))))  # row 0
    fix_n = _edge_fix(ext(n_strip, nw, ne), taps((2, slice(None))))  # row n-1
    fix_w = _edge_fix(ext(w_strip, sw, nw), taps((slice(None), 0)))  # col 0
    fix_e = _edge_fix(ext(e_strip, se, ne), taps((slice(None), 2)))  # col n-1

    # Corner double-count (each corner ghost entered via both edges).
    def corner(ghost, dy, dx):
        kk = jnp.stack([k_eq[dy, dx]] * 4 + [k_pole[dy, dx]] * 2, axis=0)
        return jnp.einsum("bfc,fcd->bfd", ghost, kk.astype(ghost.dtype))

    c_sw = corner(sw, 0, 0)
    c_se = corner(se, 0, 2)
    c_nw = corner(nw, 2, 0)
    c_ne = corner(ne, 2, 2)

    # 3. one fused masked-add pass: out[b,f,i,j,:] gains the edge fixes on
    # its boundary ring and loses the corner duplicates.  All broadcasting
    # elementwise ops — XLA fuses this with the conv output into one pass.
    row = lax.broadcasted_iota(jnp.int32, (n, n), 0)[None, None, :, :, None]
    col = lax.broadcasted_iota(jnp.int32, (n, n), 1)[None, None, :, :, None]
    zero = jnp.zeros((), out.dtype)
    ring = (
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
    out = out + ring

    if bias_eq is not None or bias_pole is not None:
        zeros = jnp.zeros(out.shape[-1], out.dtype)
        b_eq = zeros if bias_eq is None else bias_eq
        b_po = zeros if bias_pole is None else bias_pole
        bias = jnp.stack([b_eq] * 4 + [b_po] * 2, axis=0)  # (6, Cout)
        out = out + bias[None, :, None, None, :].astype(out.dtype)
    return out
