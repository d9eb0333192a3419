"""Cubed-sphere U-Net.

Capability parity with the reference's functional-API U-Net assembly
(``DLWPFunctional`` + the examples' encoder/decoder graphs of
CubeSpherePadding2D -> CubeSphereConv2D -> LeakyReLU with AveragePooling /
UpSampling and skip concatenations — SURVEY.md §2 rows 7, 20 and §3.2).

TPU-first: the whole network is one jittable flax module over
``(B, 6, n, n, C)`` activations; bf16 compute is a config switch
(params stay f32); downsampling never crosses faces, and every conv carries
its own fused halo exchange.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dlwp_cs_tpu.models.config import UNetConfig
from dlwp_cs_tpu.models.layers import CubeSphereConv2D
from dlwp_cs_tpu.ops.pooling import cs_avg_pool, cs_max_pool, cs_upsample

__all__ = ["CubeSphereUNet"]


def _activation(cfg: UNetConfig):
    if cfg.activation == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=cfg.activation_slope)
    if cfg.activation == "relu":
        return nn.relu
    if cfg.activation == "gelu":
        return nn.gelu
    if cfg.activation == "tanh":
        return jnp.tanh
    raise ValueError(f"unknown activation {cfg.activation!r}")


class CubeSphereUNet(nn.Module):
    """Encoder/decoder CNN on the cubed sphere with skip connections.

    Input ``(B, 6, n, n, C_in)`` -> output ``(B, 6, n, n, C_out)``; ``n`` must
    be divisible by ``2**(len(filters) - 1)``.
    """

    config: UNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        act = _activation(cfg)
        dtype = jnp.dtype(cfg.compute_dtype)
        pool = cs_avg_pool if cfg.pooling == "avg" else cs_max_pool
        depth = len(cfg.filters)
        n = x.shape[-2]
        if n % (2 ** (depth - 1)) != 0:
            raise ValueError(
                f"face size {n} not divisible by 2**{depth - 1} for {depth} levels"
            )

        from dlwp_cs_tpu.ops.packing import pack_batch, unpack_batch

        b0 = x.shape[0]  # logical (unpacked) batch

        def block_pack_factor(c_in: int, features: int, n_level: int) -> int:
            # Batch->lane pack regions (ops.packing): convs, activations and
            # pooling run packed; repacks happen only at level transitions —
            # XLA does not cancel the relayouts between per-conv packing
            # regions (conv-relu-conv measured at 2.46x a single conv;
            # tools/kernel_variants.py --chain).  Same trace-time gate as
            # every other packing site; only the fused 3x3 path benefits, so
            # other configurations stay unpacked.
            if tuple(cfg.kernel_size) != (3, 3) or cfg.conv_backend not in (
                "auto", "pallas", "pallas_interpret", "ringfix"
            ):
                return 1
            from dlwp_cs_tpu.ops.ringfix import _pack_base_enabled

            if not _pack_base_enabled():
                return 1
            from dlwp_cs_tpu.ops.pallas_conv import _pack_factor

            c_max = max(c_in, features)
            return _pack_factor(
                b0, n_level, c_max, c_max, jnp.dtype(dtype).itemsize
            )

        def repack(h, p_from: int, p_to: int):
            if p_from != p_to and p_from > 1:
                h = unpack_batch(h, p_from)
            if p_from != p_to and p_to > 1:
                h = pack_batch(h, p_to)
            return h

        def conv_block(h, c_in, features, name, p: int):
            # h enters packed with factor p (p == 1: plain layout).  The pack
            # factor is chosen PER CONV, not per block: a decoder block's
            # first conv sees the wide skip-concat input (96/192 lanes,
            # unpackable), but its second conv is back at the level's small
            # channel count where packing measured 2.1x per conv even
            # including the boundary relayouts (PERF.md).  Returns
            # ``(h, p_out)`` so the caller continues in the final layout.
            for i in range(cfg.convs_per_block):
                p_i = block_pack_factor(
                    c_in if i == 0 else features, features, h.shape[-2]
                )
                h = repack(h, p, p_i)
                p = p_i
                h = CubeSphereConv2D(
                    features=features,
                    kernel_size=cfg.kernel_size,
                    separate_polar_weights=cfg.separate_polar_weights,
                    backend=cfg.conv_backend,
                    dtype=dtype,
                    lane_pack=p,
                    name=f"{name}_conv{i}",
                )(h)
                h = act(h)
            return h, p

        x = x.astype(dtype)
        # Encoder: one pack region per level, pooling included; skips are
        # stored packed with their level's factor
        skips = []
        cin = x.shape[-1]
        p = 1
        for level, feats in enumerate(cfg.filters[:-1]):
            x, p = conv_block(x, cin, feats, f"enc{level}", p)
            skips.append((x, p))
            x = pool(x, 2)
            cin = feats
        # Bottleneck
        x, p = conv_block(x, cin, cfg.filters[-1], f"enc{depth - 1}", p)
        x = repack(x, p, 1)
        # Decoder (unpacked between stages: skip concats mix channel counts
        # whose packed layouts differ; the blocks pack themselves — the
        # second conv of each block repacks to the level's small-channel
        # factor even though the concat-fed first conv cannot)
        for level in range(depth - 2, -1, -1):
            x = cs_upsample(x, 2, method=cfg.upsample)
            skip, skip_p = skips[level]
            if skip_p > 1:
                skip = unpack_batch(skip, skip_p)
            x = jnp.concatenate([x, skip], axis=-1)
            x, p_dec = conv_block(
                x, x.shape[-1], cfg.filters[level], f"dec{level}", 1
            )
            x = repack(x, p_dec, 1)
        # Linear output head
        out = CubeSphereConv2D(
            features=cfg.output_channels,
            kernel_size=cfg.final_kernel_size,
            separate_polar_weights=cfg.separate_polar_weights,
            backend=cfg.conv_backend,
            dtype=dtype,
            name="head",
        )(x)
        return out.astype(jnp.float32)
