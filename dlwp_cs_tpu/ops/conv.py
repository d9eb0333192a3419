"""Cubed-sphere convolution (XLA path): halo-pad then per-face-group conv.

Capability parity with ``DLWP/custom.py::CubeSphereConv2D`` (SURVEY.md §2
row 2): full Conv2D semantics (stride, dilation, bias) applied per face on the
halo-padded tensor, with **separate kernel weights for the 4 equatorial faces
and the 2 polar faces**.

TPU-first design decisions (vs. the reference's Keras layer):

* Faces are folded into the batch dimension so each weight group is a single
  ``lax.conv_general_dilated`` call (2 conv calls total, both large and
  MXU-friendly) instead of the reference's per-face sequential conv dispatch
  (SURVEY.md §3.2 bottleneck list).
* NHWC/HWIO layout, bf16-friendly; XLA lowers to MXU convolutions directly.
* **No south-pole flip is needed**: our face charts are chirality-consistent
  (every chart right-handed w.r.t. the outward normal — see geometry module),
  so one polar kernel sees the same apparent orientation at both poles.  The
  reference must flip because its face construction is not
  chirality-consistent; this is behavioral parity achieved by construction.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.geometry.cubed_sphere import EQUATORIAL_FACES, POLAR_FACES
from dlwp_cs_tpu.ops.padding import cs_pad

__all__ = ["cs_conv", "conv_halo_width", "use_conv3x3_impl"]

# Whole-conv override for the hot 3x3/stride-1 configuration (analog of
# ops.padding.use_pad_impl, which only overrides the PAD).  Installed by
# parallel.overlap so sharded models run the overlap-friendly band ring-fix
# conv instead of pad-then-VALID-conv; trace-time dispatch, no jit cost.
_CONV3_IMPL: contextvars.ContextVar = contextvars.ContextVar(
    "cs_conv3x3_impl", default=None
)


@contextlib.contextmanager
def use_conv3x3_impl(fn):
    """Within this context, 3x3/stride-1 ``cs_conv`` calls delegate to
    ``fn(x, kernel_eq, kernel_pole, bias_eq, bias_pole)``; other
    configurations keep their normal dispatch (e.g. the installed pad
    impl)."""
    token = _CONV3_IMPL.set(fn)
    try:
        yield
    finally:
        _CONV3_IMPL.reset(token)

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv_halo_width(kernel_size: tuple[int, int], dilation: int = 1) -> int:
    """Halo width needed for 'same'-size output with a centered odd kernel."""
    kh, kw = kernel_size
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError(f"cubed-sphere conv requires odd kernels, got {kernel_size}")
    return max((kh - 1) // 2, (kw - 1) // 2) * dilation


def _group_conv(xp, kernel, stride, dilation):
    """Conv one face group: ``xp`` is (B, F, Hp, Wp, Cin) already padded."""
    b, f = xp.shape[0], xp.shape[1]
    merged = xp.reshape((b * f,) + xp.shape[2:])
    out = lax.conv_general_dilated(
        merged,
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMSPEC,
        preferred_element_type=merged.dtype,
    )
    return out.reshape((b, f) + out.shape[1:])


def cs_conv(
    x,
    kernel_eq,
    kernel_pole,
    *,
    bias_eq=None,
    bias_pole=None,
    stride: int = 1,
    dilation: int = 1,
    backend: str = "auto",
):
    """Cubed-sphere convolution with equatorial/polar weight groups.

    Args:
      x: ``(B, 6, n, n, Cin)`` channels-last input.
      kernel_eq / kernel_pole: ``(kh, kw, Cin, Cout)`` HWIO kernels for the
        equatorial faces (0-3) and polar faces (4-5) respectively. Pass the
        same array for both to share weights globally.
      bias_eq / bias_pole: optional ``(Cout,)`` biases per group.
      stride, dilation: standard conv parameters (square).
      backend: 'auto' (ring-fix fused path for 3x3/stride-1 — SAME conv +
        O(perimeter) halo correction, the fastest formulation; else XLA),
        'ringfix', 'xla', 'pallas' (VMEM-fused kernel), 'xring' (XLA SAME
        conv + Pallas ring kernel — ops.ring_kernel), 'int8' (quantized
        base convs, inference/serving — ops.quant), or the
        '*_interpret' variants (CPU testing of the kernels).

    Returns ``(B, 6, n', n', Cout)`` where ``n' = n // stride`` (the halo
    supplies the boundary context, so output size is exactly ``n/stride``).
    """
    if x.ndim != 5 or x.shape[1] != 6:
        raise ValueError(f"expected (B, 6, n, n, C), got {x.shape}")
    if kernel_eq.shape != kernel_pole.shape:
        raise ValueError(
            f"kernel group shapes differ: {kernel_eq.shape} vs {kernel_pole.shape}"
        )
    kh, kw = kernel_eq.shape[0], kernel_eq.shape[1]
    is_3x3s1 = (kh, kw) == (3, 3) and stride == 1 and dilation == 1
    impl = _CONV3_IMPL.get()
    if impl is not None and is_3x3s1:
        return impl(x, kernel_eq, kernel_pole, bias_eq, bias_pole)
    if backend == "auto" and is_3x3s1 and not _pad_impl_installed():
        # On TPU the VMEM-fused Pallas kernel is the fast path where
        # batch->lane packing can fill the MXU (full-model train step 13.5
        # vs 19.0 ms for ring-fix — PERF.md r2).  Where packing is
        # unavailable AND the channel counts are asymmetric (the decoder's
        # concat convs, 96->32 / 192->64), the kernel's 9-tap dots underfill
        # the MXU and the dual-base ring-fix composition measured FASTER
        # (559 vs 686 us fwd at n=48 96->32 — PERF.md r3 base-structure
        # matrix), so auto keeps those on ring-fix.
        if _on_tpu() and not _pallas_unprofitable(x, kernel_eq):
            fused = _maybe_pallas(
                x, kernel_eq, kernel_pole, bias_eq, bias_pole,
                stride, dilation, "pallas",
            )
            if fused is not None:
                return fused
        from dlwp_cs_tpu.ops.ringfix import cs_conv3x3_ringfix

        return cs_conv3x3_ringfix(
            x, kernel_eq, kernel_pole, bias_eq=bias_eq, bias_pole=bias_pole
        )
    if backend == "ringfix" and is_3x3s1 and not _pad_impl_installed():
        from dlwp_cs_tpu.ops.ringfix import cs_conv3x3_ringfix

        return cs_conv3x3_ringfix(
            x, kernel_eq, kernel_pole, bias_eq=bias_eq, bias_pole=bias_pole
        )
    if backend == "int8" and is_3x3s1 and not _pad_impl_installed():
        # Quantized inference path (serving): int8 base convs + bf16 seam
        # algebra — ops.quant.  Non-3x3 layers (the 1x1 head) fall through
        # to the generic path below, like 'pallas'/'ringfix'.
        from dlwp_cs_tpu.ops.quant import cs_conv3x3_int8

        return cs_conv3x3_int8(
            x, kernel_eq, kernel_pole, bias_eq=bias_eq, bias_pole=bias_pole
        )
    if backend in ("xring", "xring_interpret") and is_3x3s1 \
            and not _pad_impl_installed():
        # XLA SAME conv + Pallas ring kernel (ops.ring_kernel): XLA's own
        # small-channel conv formulation for the FLOPs, one kernel for the
        # O(perimeter) halo correction.
        from dlwp_cs_tpu.ops.ring_kernel import cs_conv3x3_xring

        cout = kernel_eq.shape[-1]
        zb = jnp.zeros((cout,), x.dtype)
        return cs_conv3x3_xring(
            x,
            kernel_eq,
            kernel_pole,
            zb if bias_eq is None else bias_eq,
            zb if bias_pole is None else bias_pole,
            backend == "xring_interpret",
        )
    if backend == "same" and is_3x3s1:
        # Perf-ablation lower bound: per-face zero-padded SAME convs with NO
        # cross-face halo — numerically WRONG at face boundaries; exists to
        # measure the halo machinery's cost (tools/ablate_step.py).  Non-3x3
        # shapes (e.g. the 1x1 head) fall through to the generic path.
        from dlwp_cs_tpu.ops.ringfix import _same_conv, add_group_bias

        out = jnp.concatenate(
            [_same_conv(x[:, :4], kernel_eq), _same_conv(x[:, 4:], kernel_pole)],
            axis=1,
        )
        return add_group_bias(out, bias_eq, bias_pole)
    # backend == "ringfix" with a non-3x3 layer (e.g. the 1x1 output head)
    # falls through to the generic XLA path, like "pallas", so a whole model
    # can pin the ring-fix formulation for its 3x3 convs.
    if backend in ("pallas", "pallas_interpret"):
        fused = _maybe_pallas(
            x, kernel_eq, kernel_pole, bias_eq, bias_pole, stride, dilation, backend
        )
        if fused is not None:
            return fused
        if is_3x3s1:
            raise ValueError(
                "pallas backend requested but configuration unsupported "
                f"(kernel={kernel_eq.shape[:2]}, stride={stride}, "
                f"dilation={dilation}, shape={x.shape})"
            )
        # non-3x3 layers (e.g. the 1x1 output head) fall through to the
        # generic XLA path so a whole model can run with backend='pallas'
    w = conv_halo_width((kh, kw), dilation)
    if w == 0:
        xp = x  # 1x1 conv: no halo needed
    else:
        xp = cs_pad(x, w)
        # non-square kernels (e.g. 3x1): cs_pad adds the max halo on both
        # axes, but the VALID conv only consumes (k-1) ghosts per axis —
        # crop the surplus so the 'same' output-shape contract holds
        wy = (kh - 1) // 2 * dilation
        wx = (kw - 1) // 2 * dilation
        if wy < w:
            xp = xp[:, :, w - wy : xp.shape[2] - (w - wy)]
        if wx < w:
            xp = xp[:, :, :, w - wx : xp.shape[3] - (w - wx)]
    # contiguous slices, not fancy indexing: a list-index lowers to a gather
    # whose VJP is a scatter (slow on TPU); a slice's VJP is a pad.
    assert EQUATORIAL_FACES == (0, 1, 2, 3) and POLAR_FACES == (4, 5)
    # NOTE: batch->lane packing was tried on this generic path and REVERTED
    # both ways: the 1x1 head's matmul is smaller than the pack/unpack
    # relayouts (+0.5 ms/step), and the pad-materializing 3x3 path REGRESSED
    # 22 -> 29 ms/step packed (the padded-tensor relayouts dominate).
    # Packing lives where it wins: the fused Pallas forward and the
    # ring-fix composition (ops.packing for the measured story).
    from dlwp_cs_tpu.ops.ringfix import add_group_bias, face_select

    if backend != "xla":
        # Production fall-through (e.g. the 1x1 head under pallas/ringfix/
        # xring): dual-base — two full 6-face convs + fused face select.
        # The face-slice + concat structure below measured 437 vs 105.7
        # us/conv at n=48/c=32 (tools/groupconv_micro.py); the explicit
        # 'xla' backend keeps it as the faithful reference-style baseline
        # (the reference dispatches its weight groups separately).
        out = face_select(
            _group_conv(xp, kernel_eq, stride, dilation),
            _group_conv(xp, kernel_pole, stride, dilation),
        )
        return add_group_bias(out, bias_eq, bias_pole)
    eq = _group_conv(xp[:, :4], kernel_eq, stride, dilation)
    pole = _group_conv(xp[:, 4:], kernel_pole, stride, dilation)
    out = jnp.concatenate([eq, pole], axis=1)
    return add_group_bias(out, bias_eq, bias_pole)


def _on_tpu() -> bool:
    """True when 'auto' should pick the Pallas kernel (trace-time dispatch).

    Single TPU device, OR inside a :func:`shard_local_region` — a shard_map
    body whose shards each hold complete faces (data-only sharding), where
    the kernel runs per-device and the partitioner never sees it.  Outside
    such a region, multi-device GSPMD keeps the ring-fix formulation: a
    ``pallas_call`` is an opaque custom call the partitioner cannot split
    (spatially sharded shard_map paths install their own pad impl and never
    reach this dispatch).
    """
    import jax

    try:
        return jax.devices()[0].platform == "tpu" and (
            jax.device_count() == 1 or _SHARD_LOCAL.get()
        )
    except Exception:
        return False


_SHARD_LOCAL: contextvars.ContextVar = contextvars.ContextVar(
    "cs_conv_shard_local", default=False
)


@contextlib.contextmanager
def shard_local_region():
    """Mark the enclosed trace as per-device shard_map code with complete
    faces per shard, making the fused Pallas conv eligible on multi-chip
    TPU meshes (used by the shard_map data-parallel train step)."""
    token = _SHARD_LOCAL.set(True)
    try:
        yield
    finally:
        _SHARD_LOCAL.reset(token)


def _pallas_unprofitable(x, kernel_eq) -> bool:
    """True for 3x3 shapes where the fused Pallas kernel measured SLOWER
    than the dual-base ring-fix composition: batch->lane packing
    unavailable (p == 1) and a contracting channel count (the decoder's
    concat convs, 96->32 / 192->64 — cin > cout).  Square pack=1 shapes
    (the 128->128 bottleneck) and expanding model-packed shapes (28->128)
    keep the kernel — its per-conv MXU fill is best there (PERF.md).

    Only applies at TRAINING-SCALE batches (folded conv batch B*6 >= 48,
    the regime of the r3/r4 measurements, e.g. 559 vs 686 us fwd at b=96).
    At serving batches (the b=1 rollout folds to 6) every formulation is
    dispatch/underfill-bound and the ring-fix's ~18 small XLA ops LOSE to
    the one fused kernel: routing the b=1 decoder convs to ring-fix cost
    the 56-step rollout 8.8 -> 12.7 ms, measured in the round-5 pinned
    same-session A/B (PERF.md round 5)."""
    from dlwp_cs_tpu.ops.pallas_conv import _pack_factor, backward_mode

    b, _, n, _, cin = x.shape
    cout = kernel_eq.shape[-1]
    if backward_mode() != "xla":
        # Only the ring-fix COMPOSITION backward loses to dual-base
        # ring-fix at these shapes; under the round-5 "split" default the
        # kernel wins everywhere measured (9.37 vs 9.89 ms/step with the
        # heuristic on — tools/r5_dispatch_ab.py).
        return False
    if b * 6 < 48:
        return False
    p = _pack_factor(b, n, cin, cout, jnp.dtype(x.dtype).itemsize)
    return p == 1 and cin > cout


def _pad_impl_installed() -> bool:
    """True when a distributed pad implementation (shard_map halo) is active.

    The single-device fused paths read neighbor faces directly, which is
    wrong under domain decomposition — those traces must use the installed
    pad + VALID conv path instead.
    """
    from dlwp_cs_tpu.ops import padding as _padding

    return _padding._PAD_IMPL.get() is not None


def _maybe_pallas(x, k_eq, k_pole, b_eq, b_pole, stride, dilation, backend):
    """Dispatch to the VMEM-fused Pallas kernel when applicable; else None.

    Shapes past the full-face VMEM gate (wide C96+, PERF.md round 4) fall
    through to the ROW-BLOCKED kernel variant when one fits
    (:func:`~dlwp_cs_tpu.ops.pallas_conv.blocked_row_count`); only then to
    the XLA ring-fix composition.
    """
    from dlwp_cs_tpu.ops.pallas_conv import (
        backward_mode,
        blocked_plan,
        cs_conv3x3_pallas,
        cs_conv3x3_pallas_blocked,
        pallas_supported,
    )

    if _pad_impl_installed():
        return None
    interpret = backend == "pallas_interpret"
    b, _, n, _, cin = x.shape
    cout = k_eq.shape[-1]
    zb = jnp.zeros((cout,), x.dtype)
    full_ok = pallas_supported(x.shape, k_eq.shape[:2], stride, dilation,
                               x.dtype, cout=cout)
    if full_ok:
        # NOTE a "prefer blocked when it unlocks a bigger pack factor"
        # rule was measured a WASH at hires C96's 32-channel outer level
        # (23.4 vs 23.2 ms/step — going p2 full-face -> p4 blocked doubles
        # the fill AND the packing waste; PERF.md round 5), so the
        # full-face kernel keeps priority whenever it fits.
        return cs_conv3x3_pallas(
            x,
            k_eq,
            k_pole,
            zb if b_eq is None else b_eq,
            zb if b_pole is None else b_pole,
            interpret,
            backward_mode(),
        )
    plan = blocked_plan(x.shape, k_eq.shape[:2], stride, dilation,
                        x.dtype, cout=cout)
    if plan is None:
        return None
    p, h = plan
    return cs_conv3x3_pallas_blocked(
        x,
        k_eq,
        k_pole,
        zb if b_eq is None else b_eq,
        zb if b_pole is None else b_pole,
        h,
        p,
        interpret,
    )
