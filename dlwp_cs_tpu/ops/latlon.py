"""Legacy lat-lon grid padding ops.

Capability parity with ``DLWP/custom.py::PeriodicPadding2D`` (and its 3D
variant) — SURVEY.md §2 row 3: periodic (wrap) padding in longitude and a
configurable zero/reflect treatment in latitude, for the non-cubed-sphere
models of the 2019 lat-lon paper.  Kept for API parity; the cubed-sphere path
is the flagship.

Layout: ``(..., H=lat, W=lon, C)`` channels-last.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["periodic_pad", "latlon_conv"]


def periodic_pad(x, width: int, lat_mode: str = "reflect"):
    """Pad lon periodically and lat by ``lat_mode`` ('reflect' | 'zero').

    ``x``: ``(..., H, W, C)``; returns ``(..., H + 2w, W + 2w, C)``.
    """
    if width < 1:
        raise ValueError(f"pad width must be >= 1, got {width}")
    w = width
    # Longitude: wrap.
    x = jnp.concatenate([x[..., :, -w:, :], x, x[..., :, :w, :]], axis=-2)
    # Latitude: reflect or zero.
    if lat_mode == "reflect":
        top = jnp.flip(x[..., :w, :, :], axis=-3)
        bot = jnp.flip(x[..., -w:, :, :], axis=-3)
        return jnp.concatenate([top, x, bot], axis=-3)
    if lat_mode == "zero":
        cfg = [(0, 0)] * (x.ndim - 3) + [(w, w), (0, 0), (0, 0)]
        return jnp.pad(x, cfg)
    raise ValueError(f"unknown lat_mode {lat_mode!r}")


def latlon_conv(x, kernel, *, bias=None, stride: int = 1, lat_mode: str = "reflect"):
    """'Same' conv on a periodic-longitude lat-lon grid.

    ``x``: ``(B, H, W, Cin)``; ``kernel``: ``(kh, kw, Cin, Cout)`` HWIO.
    """
    from jax import lax

    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError(f"odd kernels required, got {(kh, kw)}")
    w = (max(kh, kw) - 1) // 2
    xp = periodic_pad(x, w, lat_mode=lat_mode) if w else x
    out = lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias
    return out
