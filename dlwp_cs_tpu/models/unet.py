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

        def block_pack_factor(h, features) -> int:
            # One batch->lane pack region per conv block (ops.packing): the
            # convs AND the activation between them run packed, sharing a
            # single pack/unpack pair — XLA does not cancel the relayouts
            # between per-conv packing regions (conv-relu-conv measured at
            # 2.46x a single conv; tools/kernel_variants.py --chain).  Same
            # trace-time gate as every other packing site; only the fused
            # 3x3 path benefits, so other configurations stay unpacked.
            if tuple(cfg.kernel_size) != (3, 3) or cfg.conv_backend not in (
                "auto", "pallas", "pallas_interpret", "ringfix"
            ):
                return 1
            from dlwp_cs_tpu.ops.ringfix import _pack_base_enabled

            if not _pack_base_enabled():
                return 1
            from dlwp_cs_tpu.ops.pallas_conv import _pack_factor

            c_max = max(h.shape[-1], features)
            return _pack_factor(
                h.shape[0], h.shape[-2], c_max, c_max, jnp.dtype(dtype).itemsize
            )

        def conv_block(h, features, name):
            p = block_pack_factor(h, features)
            if p > 1:
                from dlwp_cs_tpu.ops.packing import pack_batch

                h = pack_batch(h, p)
            for i in range(cfg.convs_per_block):
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
            if p > 1:
                from dlwp_cs_tpu.ops.packing import unpack_batch

                h = unpack_batch(h, p)
            return h

        x = x.astype(dtype)
        # Encoder
        skips = []
        for level, feats in enumerate(cfg.filters[:-1]):
            x = conv_block(x, feats, f"enc{level}")
            skips.append(x)
            x = pool(x, 2)
        # Bottleneck
        x = conv_block(x, cfg.filters[-1], f"enc{depth - 1}")
        # Decoder
        for level in range(depth - 2, -1, -1):
            x = cs_upsample(x, 2, method=cfg.upsample)
            x = jnp.concatenate([x, skips[level]], axis=-1)
            x = conv_block(x, cfg.filters[level], f"dec{level}")
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
