"""Legacy lat-lon U-Net (the 2019 paper's model family).

Capability parity with the reference's non-cubed-sphere models — Keras nets
built from ``PeriodicPadding2D`` + stock Conv2D layers via ``DLWPNeuralNet``
(SURVEY.md §2 rows 3, 6).  Convolutions wrap in longitude and reflect at the
latitude boundaries (:mod:`dlwp_cs_tpu.ops.latlon`); otherwise the
architecture mirrors :class:`dlwp_cs_tpu.models.unet.CubeSphereUNet` so the
same config/training/rollout stack drives both model families.

Layout: ``(B, H=lat, W=lon, C)`` channels-last.
"""

from __future__ import annotations

from collections.abc import Callable

import flax.linen as nn
import jax.numpy as jnp

from dlwp_cs_tpu.models.config import UNetConfig
from dlwp_cs_tpu.models.unet import _activation
from dlwp_cs_tpu.ops.latlon import latlon_conv

__all__ = ["LatLonConv2D", "LatLonUNet"]


class LatLonConv2D(nn.Module):
    """Conv2D with periodic-longitude / reflected-latitude padding."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    stride: int = 1
    use_bias: bool = True
    lat_mode: str = "reflect"
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            self.kernel_init,
            (*self.kernel_size, cin, self.features),
            self.param_dtype,
        )
        b = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k = k.astype(self.dtype)
            b = None if b is None else b.astype(self.dtype)
        return latlon_conv(
            x, k, bias=b, stride=self.stride, lat_mode=self.lat_mode
        )


def _pool(x, window, mode: str = "avg"):
    h, w = x.shape[-3], x.shape[-2]
    if h % window or w % window:
        raise ValueError(f"grid {(h, w)} not divisible by pool window {window}")
    shape = x.shape[:-3] + (h // window, window, w // window, window, x.shape[-1])
    r = x.reshape(shape)
    return r.max(axis=(-4, -2)) if mode == "max" else r.mean(axis=(-4, -2))


def _upsample(x, factor, method: str = "nearest"):
    if method == "bilinear":
        import jax

        h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
        lead = x.shape[:-3]
        flat = x.reshape((-1, h, w, c))
        out = jax.image.resize(
            flat, (flat.shape[0], h * factor, w * factor, c), method="bilinear"
        )
        return out.reshape(lead + (h * factor, w * factor, c))
    # broadcast+reshape, not jnp.repeat: repeat lowers to a gather whose
    # VJP is a serializing TPU scatter (the same reason ops/pooling
    # .cs_upsample uses this formulation); broadcast's VJP is a reduce
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    lead = x.shape[:-3]
    out = jnp.broadcast_to(
        x[..., :, None, :, None, :], lead + (h, factor, w, factor, c)
    )
    return out.reshape(lead + (h * factor, w * factor, c))


class LatLonUNet(nn.Module):
    """Encoder/decoder CNN on a periodic lat-lon grid.

    Input ``(B, H, W, C_in)`` -> ``(B, H, W, C_out)``; H and W must divide by
    ``2**(len(filters) - 1)``.
    """

    config: UNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        act = _activation(cfg)
        dtype = jnp.dtype(cfg.compute_dtype)
        depth = len(cfg.filters)
        h, w = x.shape[-3], x.shape[-2]
        div = 2 ** (depth - 1)
        if h % div or w % div:
            raise ValueError(f"grid {(h, w)} not divisible by 2**{depth - 1}")

        def block(hx, feats, name):
            for i in range(cfg.convs_per_block):
                hx = LatLonConv2D(
                    features=feats,
                    kernel_size=cfg.kernel_size,
                    dtype=dtype,
                    name=f"{name}_conv{i}",
                )(hx)
                hx = act(hx)
            return hx

        x = x.astype(dtype)
        skips = []
        for level, feats in enumerate(cfg.filters[:-1]):
            x = block(x, feats, f"enc{level}")
            skips.append(x)
            x = _pool(x, 2, cfg.pooling)
        x = block(x, cfg.filters[-1], f"enc{depth - 1}")
        for level in range(depth - 2, -1, -1):
            x = _upsample(x, 2, cfg.upsample)
            x = jnp.concatenate([x, skips[level]], axis=-1)
            x = block(x, cfg.filters[level], f"dec{level}")
        out = LatLonConv2D(
            features=cfg.output_channels,
            kernel_size=cfg.final_kernel_size,
            dtype=dtype,
            name="head",
        )(x)
        return out.astype(jnp.float32)
