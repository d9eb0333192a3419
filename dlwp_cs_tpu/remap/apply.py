"""On-device remap application + face/column reshape parity helpers.

The reference applies remap weights by running TempestRemap's
``ApplyOfflineMap`` as a subprocess, file-to-file, then reshapes the flat
``ncol = 6*n*n`` column dimension into faces with xarray
(``convert_to_faces`` / ``convert_from_faces`` — SURVEY.md §2 row 15).

Here application is a jittable sparse contraction (gather + segment_sum) so
remapping runs on-device — usable offline (dataset build) *and* online inside
the input pipeline or verification path (e.g. inverse-remapping forecasts to
lat-lon for maps).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.ops import segment_sum

from dlwp_cs_tpu.remap.weights import RemapWeights

__all__ = ["apply_remap", "remap_ll_to_cs", "remap_cs_to_ll", "to_faces", "from_faces"]


def apply_remap(weights: RemapWeights, x):
    """Apply a sparse remap along the last axis: ``(..., n_src) -> (..., n_tgt)``.

    Jit-safe: the weight arrays become compile-time constants when closed
    over, and the contraction is one gather + one segment_sum.
    """
    if x.shape[-1] != weights.shape[1]:
        raise ValueError(f"source dim {x.shape[-1]} != {weights.shape[1]}")
    cols = jnp.asarray(weights.cols)
    rows = jnp.asarray(weights.rows)
    # never cast the weights to an integer input dtype — bilinear weights in
    # (0,1) would truncate to 0 and an int field (e.g. a land-sea mask)
    # would silently remap to all zeros; promote the field instead
    if not jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        x = jnp.asarray(x, jnp.float32)
    vals = jnp.asarray(weights.vals, dtype=x.dtype)
    gathered = x[..., cols] * vals
    out = segment_sum(
        jnp.moveaxis(gathered, -1, 0),
        rows,
        num_segments=weights.shape[0],
    )
    return jnp.moveaxis(out, 0, -1)


def remap_ll_to_cs(weights: RemapWeights, x, n: int):
    """``(..., H, W) -> (..., 6, n, n)`` via an LL->CS weight matrix."""
    flat = x.reshape(x.shape[:-2] + (-1,))
    out = apply_remap(weights, flat)
    return out.reshape(x.shape[:-2] + (6, n, n))


def remap_cs_to_ll(weights: RemapWeights, x, n_lat: int, n_lon: int):
    """``(..., 6, n, n) -> (..., H, W)`` via a CS->LL weight matrix."""
    flat = x.reshape(x.shape[:-3] + (-1,))
    out = apply_remap(weights, flat)
    return out.reshape(x.shape[:-3] + (n_lat, n_lon))


def to_faces(x, n: int):
    """Reshape a flat column dim ``ncol = 6*n*n`` into ``(6, n, n)``.

    Parity with the reference's ``convert_to_faces`` (its TempestRemap files
    carry a flat ``ncol`` dim); our canonical column order is
    ``face-major, then i (eta row), then j (xi col)``.
    """
    if x.shape[-1] != 6 * n * n:
        raise ValueError(f"expected ncol={6 * n * n}, got {x.shape[-1]}")
    return x.reshape(x.shape[:-1] + (6, n, n))


def from_faces(x):
    """Inverse of :func:`to_faces`: ``(..., 6, n, n) -> (..., 6*n*n)``."""
    if x.ndim < 3 or x.shape[-3] != 6 or x.shape[-1] != x.shape[-2]:
        raise ValueError(f"expected (..., 6, n, n), got {x.shape}")
    return x.reshape(x.shape[:-3] + (-1,))
