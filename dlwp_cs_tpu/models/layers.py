"""Flax layers wrapping the cubed-sphere ops.

Capability parity with the reference's Keras custom layers
(``DLWP/custom.py::CubeSpherePadding2D`` + ``CubeSphereConv2D``, SURVEY.md §2
rows 1-2).  In the reference, padding and convolution are two separate graph
layers; here padding is fused into the conv op (and further into a Pallas
kernel on TPU), so the layer surface is just the convolution with its
equatorial/polar weight groups.
"""

from __future__ import annotations

from collections.abc import Callable

import flax.linen as nn
import jax.numpy as jnp

from dlwp_cs_tpu.ops.conv import cs_conv

__all__ = ["CubeSphereConv2D"]


class CubeSphereConv2D(nn.Module):
    """Cubed-sphere convolution with separate equatorial/polar kernels.

    Input/output: ``(B, 6, n, n, C)`` channels-last.

    Attributes:
      features: output channels.
      kernel_size: (kh, kw), odd.
      stride / dilation: square stride / dilation.
      use_bias: add per-group bias.
      separate_polar_weights: if False, one kernel serves all 6 faces
        (ablation / parity with the reference's optional flat weighting).
      dtype: computation dtype (params kept in param_dtype).
      lane_pack: the input is batch->lane PACKED with this factor
        (ops.packing): the layer's LOGICAL parameters stay
        ``(kh, kw, Cin/lane_pack, features)`` and are block-diagonalized at
        apply time, and the output stays packed ``lane_pack * features``.
        Lets consecutive convs in a block share ONE pack/unpack pair —
        XLA does not cancel the boundary relayouts between per-conv packing
        regions (measured conv-relu-conv at 2.46x a single conv).
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    separate_polar_weights: bool = True
    backend: str = "auto"  # cs_conv dispatch: auto | xla | pallas | pallas_interpret
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32
    lane_pack: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.lane_pack
        if x.shape[-1] % p:
            raise ValueError(
                f"packed input channels {x.shape[-1]} not divisible by "
                f"lane_pack {p}"
            )
        cin = x.shape[-1] // p
        kshape = (*self.kernel_size, cin, self.features)
        k_eq = self.param("kernel_eq", self.kernel_init, kshape, self.param_dtype)
        if self.separate_polar_weights:
            k_pole = self.param(
                "kernel_pole", self.kernel_init, kshape, self.param_dtype
            )
        else:
            k_pole = k_eq
        b_eq = b_pole = None
        if self.use_bias:
            b_eq = self.param(
                "bias_eq", self.bias_init, (self.features,), self.param_dtype
            )
            if self.separate_polar_weights:
                b_pole = self.param(
                    "bias_pole", self.bias_init, (self.features,), self.param_dtype
                )
            else:
                b_pole = b_eq
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k_eq, k_pole = k_eq.astype(self.dtype), k_pole.astype(self.dtype)
            if b_eq is not None:
                b_eq, b_pole = b_eq.astype(self.dtype), b_pole.astype(self.dtype)
        if p > 1:
            from dlwp_cs_tpu.ops.packing import block_diag_taps

            k_eq = block_diag_taps(k_eq, p)
            k_pole = (
                k_eq if not self.separate_polar_weights
                else block_diag_taps(k_pole, p)
            )
            if b_eq is not None:
                b_eq = jnp.tile(b_eq, p)
                b_pole = (
                    b_eq if not self.separate_polar_weights
                    else jnp.tile(b_pole, p)
                )
        return cs_conv(
            x,
            k_eq,
            k_pole,
            bias_eq=b_eq,
            bias_pole=b_pole,
            stride=self.stride,
            dilation=self.dilation,
            backend=self.backend,
        )
