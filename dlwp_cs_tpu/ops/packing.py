"""Batch->lane channel packing for small-channel convolutions.

At the U-Net's outer levels (Cin = Cout = 32) a conv tap's (Cin, Cout)
contraction fills 32/128 of the MXU's rows and columns — ~6% of the array.
Packing ``p`` batch items into the lane (channel) dimension and convolving
with block-diagonal tap weights executes ``p`` x the MACs at ~``p^2`` x the
MXU fill: measured 2.1x per conv at n=48/c=32/p=4 including the pack/unpack
transposes, 3.7x with packing resident (tools/kernel_variants.py, v5e).
The packed call computes the EXACT same linear map (the off-diagonal blocks
are zero), so autodiff through pack -> conv -> unpack yields the correct
(and equally accelerated) dx and dw.

Used by the fused Pallas conv (ops.pallas_conv) and the ring-fix XLA
formulation (ops.ringfix) — the latter also accelerates the default
training backward, which runs through the ring-fix composition VJP.

Reference parity note: the reference (DLWP/custom.py CubeSphereConv2D)
has no analog; this is TPU-hardware shaping.

Caveat — non-finite inputs couple pack groups: the cross-item lanes are
multiplied by ZERO weights, and ``0 * inf == nan``, so an inf/NaN value in
one sample poisons the outputs of the other ``p - 1`` samples in its pack
group (the unpacked path keeps samples independent).  The data pipeline
imputes/normalizes NaNs before batching (``SeriesDataset``), so packed
inputs are finite in every supported flow; feed pre-sanitized data if you
call the packed conv directly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pack_factor", "pack_batch", "unpack_batch", "block_diag_taps"]


def pack_factor(b: int, cin: int, cout: int, cap: int = 128) -> int:
    """Largest p in {8, 4, 2} with b % p == 0 and p * max(cin, cout) <= cap."""
    for p in (8, 4, 2):
        if b % p == 0 and p * max(cin, cout) <= cap:
            return p
    return 1


def pack_batch(x, p: int):
    """(B, 6, n, m, C) -> (B/p, 6, n, m, p*C), p-major in the lane dim."""
    b, f, n, m, c = x.shape
    y = x.reshape(b // p, p, f, n, m, c)
    y = jnp.moveaxis(y, 1, 4)
    return y.reshape(b // p, f, n, m, p * c)


def unpack_batch(y, p: int):
    """Inverse of :func:`pack_batch`."""
    bp_, f, n, m, pc_ = y.shape
    c = pc_ // p
    y = y.reshape(bp_, f, n, m, p, c)
    y = jnp.moveaxis(y, 4, 1)
    return y.reshape(bp_ * p, f, n, m, c)


def block_diag_taps(k, p: int):
    """(kh, kw, Cin, Cout) -> (kh, kw, p*Cin, p*Cout) block-diagonal per tap.

    ``kbd[h, w, i*Cin + ci, j*Cout + co] = (i == j) * k[h, w, ci, co]`` —
    matches the p-major lane layout of :func:`pack_batch`.
    """
    kh, kw, cin, cout = k.shape
    eye = jnp.eye(p, dtype=k.dtype)
    kbd = jnp.einsum("ij,hwcd->hwicjd", eye, k)
    return kbd.reshape(kh, kw, p * cin, p * cout)
