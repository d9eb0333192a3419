"""Per-face pooling and upsampling on the cubed sphere.

Capability parity with the reference U-Net's ``AveragePooling3D`` /
``UpSampling3D`` usage (faces kept, H/W pooled — SURVEY.md §3.2): pooling and
upsampling never cross face boundaries, so these are plain per-face ops with
the face axis folded into batch.  Implemented with reshape-mean / repeat
(XLA-fusable; no gather) rather than reduce_window, which is faster on TPU for
the small windows used here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cs_avg_pool", "cs_max_pool", "cs_upsample"]


def _check(x):
    if x.ndim < 5 or x.shape[-4] != 6:
        raise ValueError(f"expected (..., 6, H, W, C), got {x.shape}")


def cs_avg_pool(x, window: int = 2):
    """Average-pool each face by ``window`` (H and W must divide evenly)."""
    _check(x)
    h, w = x.shape[-3], x.shape[-2]
    if h % window or w % window:
        raise ValueError(f"face size {(h, w)} not divisible by window {window}")
    shape = x.shape[:-3] + (h // window, window, w // window, window, x.shape[-1])
    return x.reshape(shape).mean(axis=(-4, -2))


def cs_max_pool(x, window: int = 2):
    """Max-pool each face by ``window``."""
    _check(x)
    h, w = x.shape[-3], x.shape[-2]
    if h % window or w % window:
        raise ValueError(f"face size {(h, w)} not divisible by window {window}")
    shape = x.shape[:-3] + (h // window, window, w // window, window, x.shape[-1])
    return x.reshape(shape).max(axis=(-4, -2))


def cs_upsample(x, factor: int = 2, method: str = "nearest"):
    """Upsample each face by ``factor``.

    ``method='nearest'`` repeats cells (the reference's UpSampling3D
    behavior); ``'bilinear'`` uses jax.image.resize per face.
    """
    _check(x)
    if method == "nearest":
        # broadcast+reshape instead of jnp.repeat: repeat lowers to a gather
        # whose VJP is a scatter (slow on TPU); broadcast's VJP is a reduce.
        h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
        lead = x.shape[:-3]
        out = jnp.broadcast_to(
            x[..., :, None, :, None, :],
            lead + (h, factor, w, factor, c),
        )
        return out.reshape(lead + (h * factor, w * factor, c))
    if method == "bilinear":
        h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
        lead = x.shape[:-3]
        flat = x.reshape((-1, h, w, c))
        out = jax.image.resize(
            flat, (flat.shape[0], h * factor, w * factor, c), method="bilinear"
        )
        return out.reshape(lead + (h * factor, w * factor, c))
    raise ValueError(f"unknown upsample method {method!r}")
