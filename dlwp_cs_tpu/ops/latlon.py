"""Legacy lat-lon grid padding ops.

Capability parity with ``DLWP/custom.py::PeriodicPadding2D`` (and its 3D
variant) — SURVEY.md §2 row 3: periodic (wrap) padding in longitude and a
configurable treatment in latitude, for the non-cubed-sphere models of the
2019 lat-lon paper.  Kept for API parity; the cubed-sphere path is the
flagship.

Layout: ``(..., H=lat, W=lon, C)`` channels-last.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["periodic_pad", "latlon_conv"]


def periodic_pad(x, width, lat_mode: str = "symmetric"):
    """Pad lon periodically and lat by ``lat_mode``.

    ``width``: int (same both axes) or ``(w_lat, w_lon)``.
    ``lat_mode``:
      * ``'symmetric'`` — duplicate boundary rows outward (np.pad
        "symmetric"; the historical default, previously misnamed
        'reflect').
      * ``'zero'`` — zero rows.
      * ``'polar'`` — the physically continuous over-pole extension: the
        ghost row beyond a pole is the boundary-adjacent row rolled by half
        the longitudes (what lies across the pole), requires even W.

    ``x``: ``(..., H, W, C)``; returns ``(..., H + 2*w_lat, W + 2*w_lon, C)``.
    """
    w_lat, w_lon = (width, width) if isinstance(width, int) else width
    if w_lat < 0 or w_lon < 0 or (w_lat == 0 and w_lon == 0):
        raise ValueError(f"invalid pad widths {(w_lat, w_lon)}")
    # Latitude FIRST, on the un-wrapped array: the 'polar' half-longitude
    # roll is defined on the ORIGINAL W columns — rolling an already
    # lon-wrapped row by its padded half-width produced misaligned,
    # duplicated seam cells (round-5 fix; regression in tests/test_latlon).
    if w_lat:
        if lat_mode in ("symmetric", "reflect"):  # 'reflect' alias kept
            top = jnp.flip(x[..., :w_lat, :, :], axis=-3)
            bot = jnp.flip(x[..., -w_lat:, :, :], axis=-3)
            x = jnp.concatenate([top, x, bot], axis=-3)
        elif lat_mode == "polar":
            n_lon = x.shape[-2]
            if n_lon % 2:
                raise ValueError(
                    "lat_mode='polar' requires an even lon count"
                )
            top = jnp.roll(
                jnp.flip(x[..., :w_lat, :, :], axis=-3), n_lon // 2, axis=-2
            )
            bot = jnp.roll(
                jnp.flip(x[..., -w_lat:, :, :], axis=-3), n_lon // 2, axis=-2
            )
            x = jnp.concatenate([top, x, bot], axis=-3)
        elif lat_mode == "zero":
            cfg = [(0, 0)] * (x.ndim - 3) + [(w_lat, w_lat), (0, 0), (0, 0)]
            x = jnp.pad(x, cfg)
        else:
            raise ValueError(f"unknown lat_mode {lat_mode!r}")
    elif lat_mode not in ("symmetric", "reflect", "polar", "zero"):
        raise ValueError(f"unknown lat_mode {lat_mode!r}")
    # Longitude: wrap (includes the just-added ghost rows).
    if w_lon:
        x = jnp.concatenate(
            [x[..., :, -w_lon:, :], x, x[..., :, :w_lon, :]], axis=-2
        )
    return x


def latlon_conv(x, kernel, *, bias=None, stride: int = 1,
                lat_mode: str = "symmetric"):
    """'Same' conv on a periodic-longitude lat-lon grid.

    ``x``: ``(B, H, W, Cin)``; ``kernel``: ``(kh, kw, Cin, Cout)`` HWIO.
    Padding is per-axis ((kh-1)/2 rows, (kw-1)/2 columns), so non-square
    kernels keep the 'same' output shape.
    """
    from jax import lax

    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError(f"odd kernels required, got {(kh, kw)}")
    w_lat, w_lon = (kh - 1) // 2, (kw - 1) // 2
    xp = (
        periodic_pad(x, (w_lat, w_lon), lat_mode=lat_mode)
        if (w_lat or w_lon)
        else x
    )
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
