"""Quantized int8 cubed-sphere convolution (inference path — measured SLOWER
than the bf16 production path at DLWP shapes; kept selectable as the record).

The v5e MXU runs int8 at 2x the bf16 rate, and XLA:TPU delivers a measured
1.5-1.9x per BASE conv at DLWP's batched shapes (tools/int8_micro.py).
That did NOT survive the full model: the 14-day rollout measures 1.7-3.1x
SLOWER than the bf16 auto path (tools/serve_bench.py + tools/int8_dissect
.py; PERF.md round 4) because (a) dynamic per-tensor quantization is a full
HBM pass plus a serializing amax reduce — as expensive as an entire bf16
conv here — and (b) the bf16 seam algebra alone already exceeds the fused
production conv's total cost at the outer levels.  DLWP at C48 is
seam-/bandwidth-bound, not MXU-bound; int8 would pay at larger grids or
fatter channels.  Formulation:

* **base convs in int8**: dynamic per-tensor activation scale (amax/127) +
  per-output-channel symmetric weight scales, zero-padded SAME conv with
  faces folded into batch, s8 x s8 -> s32 accumulation, dequantized with one
  fused multiply.  The dual-base structure (two full 6-face convs + fused
  face select) carries over from the bf16 path (PERF.md round-3: the
  face-slice/concat relayouts dominate the extra conv FLOPs, and int8 makes
  the FLOPs cheaper still).
* **halo ring correction stays bf16/f32** on the original activations
  (:func:`dlwp_cs_tpu.ops.ringfix.ring_term` — O(perimeter) work):
  quantization error enters only through the interior conv term, never
  through the cross-face seam algebra, so face-boundary continuity is as
  good as the unquantized model's.

This path is inference-only by design (weights quantize fresh at trace time
from the bf16/f32 params — no separate quantized checkpoint format; the
rounding ops carry zero gradients).  Select with ``conv_backend="int8"``
(UNetConfig/ConvLSTMConfig) or ``ForecastService(..., quantize=True)``.

Reference note: the reference has no quantized path (pure f32 Keras); this
is TPU-native added capability, with the accuracy cost measured in
tests/test_quant.py and PERF.md.
"""

from __future__ import annotations

import jax.numpy as jnp

from dlwp_cs_tpu.ops.ringfix import _same_conv, add_group_bias, face_select, ring_term

__all__ = ["cs_conv3x3_int8", "quantize_tensor", "quantize_kernel"]


def quantize_tensor(x):
    """Per-tensor symmetric int8: ``(q, scale)`` with ``q*scale ~= x``."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_kernel(k):
    """Per-output-channel symmetric int8 for an HWIO kernel:
    ``(q, scales[Cout])``."""
    kf = k.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
    scales = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(kf / scales), -127, 127).astype(jnp.int8)
    return q, scales


def _same_conv_int8(qx, qk):
    """Zero-padded SAME conv, s8 x s8 -> s32, faces folded into batch
    (the shared ringfix helper with an s32 accumulator)."""
    return _same_conv(qx, qk, preferred_element_type=jnp.int32)


def cs_conv3x3_int8(x, k_eq, k_pole, *, bias_eq=None, bias_pole=None):
    """Quantized CS conv, 3x3/stride-1: ``(B, 6, n, n, Cin) -> (..., Cout)``.

    Approximates :func:`dlwp_cs_tpu.ops.ringfix.cs_conv3x3_ringfix` with the
    base SAME convs computed in int8 (max relative error ~1/127 of the
    activation range per conv; see tests/test_quant.py for the pinned
    bound and the exact-integers exactness case).
    """
    b, nf, n, n2, cin = x.shape
    if nf != 6 or n != n2:
        raise ValueError(f"expected (B, 6, n, n, C), got {x.shape}")

    qx, sx = quantize_tensor(x)
    qke, ske = quantize_kernel(k_eq)
    qkp, skp = quantize_kernel(k_pole)
    # dequant folds both scales into one fused multiply per group
    eq = _same_conv_int8(qx, qke).astype(jnp.float32) * (sx * ske)
    po = _same_conv_int8(qx, qkp).astype(jnp.float32) * (sx * skp)
    out = face_select(eq, po).astype(x.dtype)
    # seam algebra on the ORIGINAL activations (unquantized)
    out = out + ring_term(x, k_eq, k_pole)
    return add_group_bias(out, bias_eq, bias_pole)
