"""Pallas fused halo-pad + cubed-sphere convolution (TPU kernel path).

Round-2 ablation (tools/ablate_step.py, 1x v5e, C48 U-Net b=16 bf16):
the XLA ring-fix formulation's halo machinery costs ~8.5 ms of the 11.7 ms
forward — not FLOPs but per-op dispatch/relayout overhead of the ~18 small
XLA ops per conv (gathers, stacks, small dots, masked adds).  This kernel
eliminates that class of cost: each (batch, face) grid step assembles the
halo-padded face tile ONCE in VMEM scratch and runs the 3x3 conv as 9
shifted MXU contractions with f32 accumulation — zero intermediate HBM
traffic, zero extra XLA ops.

Division of labor with :mod:`dlwp_cs_tpu.ops.halo`:

* the *corner-extended* ghost strips come from :func:`halo.ext_strips`
  (one gather pair in XLA, shared with the ring-fix path) — so the kernel
  contains no orientation/corner logic (Mosaic cannot lower ``rev``), and
  no 1-D vector ops (the round-1 kernel's bf16 blocker);
* the kernel consumes ``x`` + ext strips and assembles ``(n+2, n+2, C)``
  padded tiles in VMEM with ROW writes only (Mosaic cannot lower
  sublane-indexed column stores for 16-bit types — hardware-bisected in
  tools/mosaic_bisect*); the W/E ghost columns enter as two in-kernel
  boundary-column correction dots instead;
* small channel counts run BATCH->LANE PACKED
  (:mod:`dlwp_cs_tpu.ops.packing`): p batch items move into the lane dim
  and the tap weights become block-diagonal — the exact same linear map at
  ~p^2 better MXU fill (a 32x32 tap fills ~6% of the 128x128 array;
  measured 2.1x per conv at n=48/c=32).  The ext strips are computed on
  the UNPACKED input and packed after, so XLA CSE shares the gather with
  the training backward's recompute (packing first cost the gather twice:
  +1.7 ms/step, bisected);
* the backward DEFAULTS to the exact VJP of the identical linear+bias map
  via the scatter-free XLA ring-fix composition (``jax.vjp`` of
  :func:`_xla_reference`; the unused primal is dead-code-eliminated) —
  measured FASTER than every Pallas-kernel backward tried on v5e;
* selectable alternatives (:func:`use_pallas_backward`, all
  grad-equivalence-tested; timings in PERF.md):

  - ``"packdw"``: dx as in ``"xla"``, but the dominant SAME-conv
    filter-gradient contraction runs in the packed layout — the
    contraction alone is 405 -> 230 us at n=48/c=32, yet the full-model
    step measured 15.7 vs 13.3 ms: decomposing the VJP into separate
    dx / base-dw / ring-dw pullbacks forfeits the CSE sharing of primal
    recomputes that the single composition ``jax.vjp`` gets.  DEAD as a
    default; kept as the measured record of why;
  - ``"hybrid"``: Pallas dx kernel + XLA weight grads — measured DEAD
    (the dx kernel is intrinsically ~1.3 TF/s regardless of output
    alignment; 23.9 vs 13.7 ms full-model step);
  - ``"fused"`` (``fused_backward=True``): all-Pallas two-kernel
    backward — measured DEAD (24.7 ms/step; the (B, 6, 3, 3, Cin, Cout)
    weight-grad blocks' HBM round-trip loses to XLA's fused transpose
    matmuls).  One kernel emits the PADDED-input cotangent ``dxp``
    (9 shifted MXU contractions of a zero-extended dout tile with the
    channel-transposed kernels), a second emits per-(batch, face)
    weight/bias gradient blocks that XLA reduces; ``dxp``'s interior plus
    its boundary ring fold through the scatter-free ``ext_strips``
    transpose (``halo._ext_transpose``) to finish ``dx``; dout's W/E
    boundary columns ride in as an XLA-sliced side input (same 16-bit
    column-indexing limitation as above).

Scope: kernel_size (3,3), stride 1, dilation 1 — the hot configuration of
every DLWP-CS conv layer; other configurations take the XLA path (dispatch
in ``ops.conv``).

Reference parity: CubeSpherePadding2D + CubeSphereConv2D fused
(``DLWP/custom.py`` — SURVEY.md §2 rows 1-2).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlwp_cs_tpu.ops import packing
from dlwp_cs_tpu.ops.halo import ext_strips

__all__ = [
    "blocked_row_count",
    "cs_conv3x3_pallas",
    "cs_conv3x3_pallas_blocked",
    "pallas_supported",
    "use_pallas_backward",
    "vmem_estimate_bytes",
]

# Backward-mode selection for 'auto'/'pallas' dispatch (ops.conv reads this
# at trace time).  Modes: "split" (hand-derived VJP — XLA's own SAME-conv
# VJP + explicit ring transpose + scatter-free Eᵀ fold, ops.ring_kernel —
# the DEFAULT since round 5), "xla" (ring-fix composition VJP, the r2-r4
# default), "packdw", "hybrid", "fused" — module docstring.  The round-5
# same-session A/B (tools/r5_dispatch_ab.py, PERF.md round 5) measured
# split at 9.37 ms/step with kernel-everywhere dispatch vs 11.18 for the
# r4 production config and 12.14 for r3's — the composition VJP had been
# dragging the step since the dual-base ring-fix landed (5503518).
_BWD_MODE: contextvars.ContextVar = contextvars.ContextVar(
    "cs_conv3x3_pallas_bwd", default="split"
)

_BWD_MODES = ("xla", "split", "packdw", "hybrid", "fused")


@contextlib.contextmanager
def use_pallas_backward(mode: str):
    """Within this context, Pallas-conv dispatch TRACES with backward
    ``mode`` ("xla" | "packdw" | "hybrid" | "fused" — module docstring).

    Trace-time only: the mode is baked in when jit traces the function, so
    wrap the call that TRIGGERS tracing.  A function already traced/cached
    under a different mode keeps its original backward (perf-ablation
    knob, not a runtime switch).
    """
    if mode not in _BWD_MODES:
        raise ValueError(f"unknown pallas backward mode {mode!r}")
    token = _BWD_MODE.set(mode)
    try:
        yield
    finally:
        _BWD_MODE.reset(token)


def backward_mode() -> str:
    return _BWD_MODE.get()


def _kernel(x_ref, ext_ref, keq_ref, kpo_ref, beq_ref, bpo_ref, out_ref, xpad,
            *, n, h=None, nblk=1):
    """One (batch, face) block: assemble the padded face in VMEM, convolve.

    Gridding over faces (not just batch) keeps the per-step VMEM footprint
    to one face + its strips (Mosaic double-buffers the pipelined blocks, so
    whole-sphere blocks blow the 16 MB budget at C48) and lets the DMA of
    face f+1 overlap the MXU work on face f.

    ``h`` (default ``n``): the block's ROW count.  ``h < n`` is the
    shard-local rectangular band of the spatially decomposed path
    (:mod:`dlwp_cs_tpu.parallel.pallas_band`): the block is rows of an
    ``(h, n)`` band whose ghost strips came from the halo collectives; the
    S/N ext rows then have length ``n + 2`` as usual while the W/E ext
    strips carry their ``h`` interior ghosts at positions ``1..h``.

    ``nblk`` (default 1): row bands per face for the single-device BLOCKED
    path (:func:`cs_conv3x3_pallas_blocked`) — grid dim 1 then enumerates
    ``6 * nblk`` (face, band) pairs and the face id is ``id // nblk``.
    """
    h = n if h is None else h
    cout = out_ref.shape[-1]
    f = pl.program_id(1) // nblk
    is_equatorial = f < 4

    def kk(dy, dx):
        # Weight-group choice is data-dependent on the face id: load both
        # small kernels and select elementwise (cheap vs. the matmuls).
        return jnp.where(is_equatorial, keq_ref[dy, dx], kpo_ref[dy, dx])

    # ---- padded face (h+2, n+2, Cin) in VMEM scratch ---------------------
    # Layout (rows, width, C): width x C are the tiled dims, so the two
    # ghost-ROW writes are full tile-planes (the ext strips carry the corner
    # ghosts at positions 0 and n+1, so the corners land via the row
    # writes).  Ghost-COLUMN stores are sublane-indexed writes Mosaic cannot
    # lower for 16-bit types (bisected on hardware: tools/mosaic_bisect2),
    # so the W/E columns stay ZERO and their contributions enter as two
    # boundary-column corrections below — O(n) dots, all in VMEM.
    xpad[:, :, :] = jnp.zeros(xpad.shape, xpad.dtype)
    xpad[1 : h + 1, 1 : n + 1, :] = x_ref[0, 0]
    xpad[0, :, :] = ext_ref[0, 0, 0]      # S ghost row incl. corners
    xpad[h + 1, :, :] = ext_ref[0, 0, 1]  # N ghost row incl. corners
    # ---- 9-tap shifted contractions on the MXU ---------------------------
    acc = jnp.zeros((h, n, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tile = xpad[dy : dy + h, dx : dx + n, :]  # (h, n, Cin)
            acc += jax.lax.dot_general(
                tile,
                kk(dy, dx),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # ---- W/E ghost-column corrections ------------------------------------
    # Output column 0 misses the dx=0 taps' reads of padded column 0 at
    # INTERIOR padded rows 1..h (the corner entries at padded rows 0/h+1
    # already arrived via the ghost-row writes); mirror for column n-1.
    row2 = lax.broadcasted_iota(jnp.int32, (h + 2, 1), 0)
    interior = jnp.logical_and(row2 > 0, row2 < h + 1)
    w_strip = jnp.where(interior, ext_ref[0, 0, 2, : h + 2], 0).astype(xpad.dtype)
    e_strip = jnp.where(interior, ext_ref[0, 0, 3, : h + 2], 0).astype(xpad.dtype)
    cw = jnp.zeros((h, cout), jnp.float32)
    ce = jnp.zeros((h, cout), jnp.float32)
    for dy in range(3):
        cw += jax.lax.dot_general(
            w_strip[dy : dy + h], kk(dy, 0),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ce += jax.lax.dot_general(
            e_strip[dy : dy + h], kk(dy, 2),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    col = lax.broadcasted_iota(jnp.int32, (h, n, 1), 1)
    acc += jnp.where(col == 0, cw[:, None, :], 0.0)
    acc += jnp.where(col == n - 1, ce[:, None, :], 0.0)
    bias = jnp.where(is_equatorial, beq_ref[:], bpo_ref[:])  # (1, Cout)
    acc += bias[None].astype(jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _kernel_npack(x_ref, ext_ref, keq_ref, kpo_ref, beq_ref, bpo_ref, out_ref,
                  xpad, *, n):
    """Lane-packed (kn2row) variant — measured DEAD, kept as the record.

    ALL 9 taps go through ONE contraction with the tap-packed kernel matrix
    ``(Cin, 9*Cout)``, followed by 9 shifted lane-sliced adds.  On v5e the
    sub-tile lane slices make Mosaic materialize padded copies of every
    slice — 30-37 MB of scoped VMEM at n=48 (over the 16 MB budget) in both
    whole-plane and per-dy formulations, and 2.4 ms/conv even with a raised
    64 MB limit vs 0.8 for the base kernel (tools/kernel_variants.py).  The
    production answer to small-channel MXU underfill is batch->lane
    block-diagonal packing (ops.packing), which needs no lane slicing.
    Exercised only by tools/kernel_variants.py; never dispatched.
    """
    cout = out_ref.shape[-1]
    f = pl.program_id(1)
    is_equatorial = f < 4
    kmat = jnp.where(is_equatorial, keq_ref[...], kpo_ref[...])  # (Cin, 9*Cout)

    xpad[:, :, :] = jnp.zeros(xpad.shape, xpad.dtype)
    xpad[1 : n + 1, 1 : n + 1, :] = x_ref[0, 0]
    xpad[0, :, :] = ext_ref[0, 0, 0]      # S ghost row incl. corners
    xpad[n + 1, :, :] = ext_ref[0, 0, 1]  # N ghost row incl. corners
    # ---- three dy-row contractions, each 3-tap lane-packed ---------------
    # (one (Cin, 9*Cout) dot over the whole padded plane blew the 16 MB
    # scoped-VMEM budget at n=48 — the 9 lane-sliced consumers materialize
    # padded copies; per-dy dots keep the live product at (n, n+2, 3*Cout))
    acc = jnp.zeros((n, n, cout), jnp.float32)
    for dy in range(3):
        prod = jax.lax.dot_general(
            xpad[dy : dy + n, :, :],
            kmat[:, dy * 3 * cout : (dy + 1) * 3 * cout],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, n+2, 3*Cout) f32
        for dx in range(3):
            acc += prod[:, dx : dx + n, dx * cout : (dx + 1) * cout]
    # ---- W/E ghost-column corrections (same as the base kernel) ----------
    row2 = lax.broadcasted_iota(jnp.int32, (n + 2, 1), 0)
    interior = jnp.logical_and(row2 > 0, row2 < n + 1)
    w_strip = jnp.where(interior, ext_ref[0, 0, 2], 0).astype(xpad.dtype)
    e_strip = jnp.where(interior, ext_ref[0, 0, 3], 0).astype(xpad.dtype)
    cw = jnp.zeros((n, cout), jnp.float32)
    ce = jnp.zeros((n, cout), jnp.float32)
    for dy in range(3):
        gw = dy * 3 + 0
        ge = dy * 3 + 2
        cw += jax.lax.dot_general(
            w_strip[dy : dy + n], kmat[:, gw * cout : (gw + 1) * cout],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ce += jax.lax.dot_general(
            e_strip[dy : dy + n], kmat[:, ge * cout : (ge + 1) * cout],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    col = lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    acc += jnp.where(col == 0, cw[:, None, :], 0.0)
    acc += jnp.where(col == n - 1, ce[:, None, :], 0.0)
    bias = jnp.where(is_equatorial, beq_ref[:], bpo_ref[:])  # (1, Cout)
    acc += bias[None].astype(jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def vmem_estimate_bytes(
    n: int, cin: int, cout: int, dtype_bytes: int = 4, h: int | None = None
) -> int:
    """Rough VMEM footprint of the fused kernel for feasibility gating.

    Per grid step the kernel holds ONE face block (+ ext strips) and its
    output; Mosaic double-buffers the pipelined in/out blocks (x2 below).
    ``h``: block row count (default ``n``; the band kernel passes its band
    height).
    """
    h = n if h is None else h
    x = 2 * h * n * cin * dtype_bytes
    strips = 2 * 4 * (n + 2) * cin * dtype_bytes
    out = 2 * h * n * cout * dtype_bytes
    pad = (h + 2) * (n + 2) * cin * dtype_bytes
    acc = h * n * cout * 4
    k = 2 * 9 * cin * cout * dtype_bytes
    return x + strips + out + pad + acc + k


def pallas_supported(x_shape, kernel_size, stride, dilation, dtype,
                     cout: int | None = None) -> bool:
    """Is the fused kernel applicable (and likely to fit VMEM)?

    Besides the pipelined block estimate, Mosaic's per-step STACK holds the
    f32 tap-accumulation temporaries, ~6 x (n*n*cout*4) bytes: the measured
    failure is n=96, cin=12, cout=64, which compiles to a 16.12 MB scoped
    allocation against the 16 MB limit (tools/capacity_bench.py, round 4)
    while cout=32 at n=96 fits.  The 15 MB gate keeps every measured-good
    shape (all n=48 production convs, C96 at cout<=32) and rejects the
    measured-OOM ones; rejected shapes fall back to the ring-fix
    composition.
    """
    if tuple(kernel_size) != (3, 3) or stride != 1 or dilation != 1:
        return False
    if jnp.dtype(dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    n = x_shape[-2]
    if x_shape[-3] != n or n < 4:
        return False
    dtype_bytes = jnp.dtype(dtype).itemsize
    cin = x_shape[-1]
    cout = cin if cout is None else int(cout)
    stack = 6 * n * n * cout * 4
    return (
        vmem_estimate_bytes(n, cin, cout, dtype_bytes) + stack < 15 * 2**20
    )


def _blocked_fits(n, h, cin, cout, dtype_bytes) -> bool:
    stack = 6 * h * n * cout * 4
    return (
        vmem_estimate_bytes(n, cin, cout, dtype_bytes, h=h) + stack
        < 15 * 2**20
    )


def blocked_plan(x_shape, kernel_size, stride, dilation, dtype,
                 cout: int | None = None) -> tuple[int, int] | None:
    """``(pack, row_block)`` for shapes past the full-face VMEM gate.

    The capacity sweep (PERF.md round 4) found wide-C96 configurations
    running at 5.3 % of peak with the fused kernel gated out (the f32
    tap-accumulation stack alone exceeds scoped VMEM at n=96, cout>=64).
    Both the xpad scratch AND the accumulation stack scale with the block
    height ``h``, so gridding each face into ``n/h`` row bands brings
    beyond-VMEM shapes back under the gate (VERDICT r4 next #3) — and
    blocking also re-opens batch->lane PACKING for small-channel levels
    that fit full-face unpacked but not packed (hires C96's 32-channel
    outer level: p=4 needs ~28 MB of stack full-face, ~11 MB at h=24).
    Prefers the largest pack factor, then the largest ``h`` in
    (n/2, n/4, n/8) with h >= 8 (a thinner band spends its time on the
    two ghost-row boundaries).  Returns None when nothing fits.
    """
    if tuple(kernel_size) != (3, 3) or stride != 1 or dilation != 1:
        return None
    if jnp.dtype(dtype) not in (jnp.float32, jnp.bfloat16):
        return None
    b = x_shape[0]
    n = x_shape[-2]
    if x_shape[-3] != n or n < 16:
        return None
    dtype_bytes = jnp.dtype(dtype).itemsize
    cin = x_shape[-1]
    cout = cin if cout is None else int(cout)
    p = packing.pack_factor(b, cin, cout)
    while p >= 1:
        for div in (2, 4, 8):
            if n % div:
                continue
            h = n // div
            if h < 8:
                break
            if _blocked_fits(n, h, p * cin, p * cout, dtype_bytes):
                return p, h
        p //= 2
    return None


def blocked_row_count(x_shape, kernel_size, stride, dilation, dtype,
                      cout: int | None = None) -> int | None:
    """Row-block height past the full-face gate (packing-unaware view)."""
    plan = blocked_plan(x_shape, kernel_size, stride, dilation, dtype,
                        cout=cout)
    return None if plan is None else plan[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def cs_conv3x3_pallas_blocked(x, k_eq, k_pole, b_eq, b_pole, row_block,
                              pack=1, interpret=False):
    """Row-blocked fused CS conv for beyond-VMEM shapes (3x3/stride-1).

    Same contract as :func:`cs_conv3x3_pallas`, but each face is gridded
    into ``n / row_block`` horizontal bands, so the VMEM working set (xpad
    scratch + f32 tap-accumulation stack) scales with ``row_block`` instead
    of ``n``.  Interior bands take their ghost rows from the face itself
    and their ghost-row corner cells from the face's W/E ghost columns —
    all local XLA slices of :func:`ops.halo.ext_strips` + ``x``; only the
    outer bands consume cross-face topology.  The kernel body is the SAME
    ``_kernel`` as the band-sharded path (``h = row_block``).  Backward:
    the XLA ring-fix composition VJP, as for the full-face kernel.
    ``pack``: batch->lane packing factor (block-diagonal taps) — blocking
    re-opens packing for small-channel levels whose PACKED working set
    exceeds the full-face budget (:func:`blocked_plan`).
    """
    return _forward_blocked(x, k_eq, k_pole, b_eq, b_pole, row_block,
                            pack, interpret)


def _blocked_ext(x, ext, nblk: int, h: int):
    """Per-band ghost strips ``(B, 6, nblk, 4, n+2, C)`` from local slices.

    Band k's S/N ghost rows are face rows ``k*h - 1`` / ``(k+1)*h`` (outer
    bands: the cross-face ``ext`` rows); their corner cells come from the
    face's W/E ghost columns at those rows (``ext`` W/E strip positions
    ``k*h`` / ``(k+1)*h + 1``).  W/E entries cover the band's rows at
    positions ``1..h`` (the `_kernel` contract for ``h < n``).
    """
    b, _, n, _, c = x.shape
    ws, es = ext[:, :, 2], ext[:, :, 3]  # (B, 6, n+2, C), pos t <-> row t-1
    s_rows, n_rows, we_rows = [], [], []
    for k in range(nblk):
        if k == 0:
            s_rows.append(ext[:, :, 0])
        else:
            r = k * h - 1
            s_rows.append(jnp.concatenate(
                [ws[:, :, r + 1 : r + 2], x[:, :, r], es[:, :, r + 1 : r + 2]],
                axis=2,
            ))
        if k == nblk - 1:
            n_rows.append(ext[:, :, 1])
        else:
            r = (k + 1) * h
            n_rows.append(jnp.concatenate(
                [ws[:, :, r + 1 : r + 2], x[:, :, r], es[:, :, r + 1 : r + 2]],
                axis=2,
            ))
        # band W/E ghost columns at buffer positions 1..h (zero elsewhere)
        pad = ((0, 0), (0, 0), (1, n + 1 - h), (0, 0))
        we_rows.append(jnp.stack(
            [
                jnp.pad(ws[:, :, k * h + 1 : k * h + h + 1], pad),
                jnp.pad(es[:, :, k * h + 1 : k * h + h + 1], pad),
            ],
            axis=2,
        ))
    s = jnp.stack(s_rows, axis=2)  # (B, 6, nblk, n+2, C)
    nn = jnp.stack(n_rows, axis=2)
    we = jnp.stack(we_rows, axis=2)  # (B, 6, nblk, 2, n+2, C)
    return jnp.concatenate(
        [s[:, :, :, None], nn[:, :, :, None], we], axis=3
    )  # (B, 6, nblk, 4, n+2, C)


def _forward_blocked(x, k_eq, k_pole, b_eq, b_pole, row_block, pack,
                     interpret):
    b, nf, n, n2, cin = x.shape
    if nf != 6 or n != n2:
        raise ValueError(f"expected (B, 6, n, n, C), got {x.shape}")
    h = int(row_block)
    if h < 1 or n % h:
        raise ValueError(f"row_block {h} must divide n={n}")
    nblk = n // h
    cout = k_eq.shape[-1]
    k_eq = k_eq.astype(x.dtype)
    k_pole = k_pole.astype(x.dtype)
    b_eq = b_eq.reshape(1, cout).astype(x.dtype)
    b_pole = b_pole.reshape(1, cout).astype(x.dtype)
    p = int(pack)
    if p > 1:
        x = packing.pack_batch(x, p)
        k_eq = packing.block_diag_taps(k_eq, p)
        k_pole = packing.block_diag_taps(k_pole, p)
        b_eq = jnp.tile(b_eq, (1, p))
        b_pole = jnp.tile(b_pole, (1, p))
        b, cin, cout = b // p, p * cin, p * cout
    ext = ext_strips(x)
    bext = _blocked_ext(x, ext, nblk, h).reshape(
        b, 6 * nblk, 4, n + 2, cin
    )
    xb = x.reshape(b, 6 * nblk, h, n, cin)
    kernel = functools.partial(_kernel, n=n, h=h, nblk=nblk)
    flops = 2 * b * 6 * n * n * 9 * cin * cout
    out = pl.pallas_call(
        kernel,
        grid=(b, 6 * nblk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, n, cin), lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 4, n + 2, cin), lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, n, cout), lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 6 * nblk, h, n, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, n + 2, cin), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xb, bext, k_eq, k_pole, b_eq, b_pole)
    out = out.reshape(b, 6, n, n, cout)
    return packing.unpack_batch(out, p) if p > 1 else out


def _fwd_blocked(x, k_eq, k_pole, b_eq, b_pole, row_block, pack, interpret):
    out = _forward_blocked(x, k_eq, k_pole, b_eq, b_pole, row_block, pack,
                           interpret)
    return out, (x, k_eq, k_pole, b_eq, b_pole)


def _bwd_blocked(row_block, pack, interpret, res, g):
    x, k_eq, k_pole, b_eq, b_pole = res
    _, pullback = jax.vjp(_xla_reference, x, k_eq, k_pole, b_eq, b_pole)
    return pullback(g)


cs_conv3x3_pallas_blocked.defvjp(_fwd_blocked, _bwd_blocked)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def cs_conv3x3_pallas(x, k_eq, k_pole, b_eq, b_pole, interpret=False,
                      fused_backward=False):
    """Fused CS conv, 3x3/stride1: ``(B, 6, n, n, Cin) -> (B, 6, n, n, Cout)``.

    ``b_eq``/``b_pole`` are required (pass zeros for no bias) so the VJP
    signature stays static.  ``interpret=True`` runs the Pallas interpreter
    (CPU tests).  ``fused_backward`` selects the backward formulation:
    ``False``/"xla" (composition VJP), "hybrid" (Pallas dx kernel + XLA
    weight grads), ``True``/"fused" (all-Pallas; measured slower on v5e —
    module docstring).  Model-level selection: :func:`use_pallas_backward`.
    """
    return _forward(x, k_eq, k_pole, b_eq, b_pole, interpret)


def _pack_factor(b: int, n: int, cin: int, cout: int,
                 dtype_bytes: int = 2, h: int | None = None) -> int:
    """Batch->lane packing factor for small-channel convs.

    A (n, n, 32) x (32, 32) tap leaves the 128x128 MXU ~94% idle (measured
    5.0 TF/s at n=48/c=32 vs 71.9 at c=128 — tools/kernel_variants.py).
    Packing p batch items into the lane dim and convolving with
    block-diagonal tap weights trades p x wasted MACs for a ~p^2 x better
    MXU fill: 2.1x measured per conv including the XLA pack/unpack
    transposes, and XLA cancels adjacent unpack∘elementwise∘pack pairs
    between consecutive convs.  The packed call computes the exact same
    linear map, so the VJP (XLA composition) is untouched.
    """
    p = packing.pack_factor(b, cin, cout)
    while p > 1 and vmem_estimate_bytes(
        n, p * cin, p * cout, dtype_bytes, h=h
    ) >= 10 * 2**20:
        p //= 2
    return p


def _forward(x, k_eq, k_pole, b_eq, b_pole, interpret):
    b, nf, n, n2, cin = x.shape
    if nf != 6 or n != n2:
        raise ValueError(f"expected (B, 6, n, n, C), got {x.shape}")
    cout = k_eq.shape[-1]
    k_eq = k_eq.astype(x.dtype)
    k_pole = k_pole.astype(x.dtype)
    b_eq = b_eq.reshape(1, cout).astype(x.dtype)
    b_pole = b_pole.reshape(1, cout).astype(x.dtype)
    # When packing, the ghost strips are gathered on the PACKED tensor:
    # full 128-lane rows gather ~free where 32-lane rows cost ~165 us
    # (tools/glue_micro.py), and the training backward (the fully-packed
    # ring-fix composition VJP) computes ext_strips(pack_batch(x)) on the
    # SAME operands, so both the pack and the gather CSE-share across
    # forward/backward.  (Two earlier orderings — ext-on-packed with an
    # UNPACKED backward, and ext-on-unpacked-then-pack-strips — each paid
    # an extra full gather somewhere; the history is in PERF.md.)
    p = _pack_factor(b, n, cin, cout, jnp.dtype(x.dtype).itemsize)
    if p > 1:
        x = packing.pack_batch(x, p)
        k_eq = packing.block_diag_taps(k_eq, p)
        k_pole = packing.block_diag_taps(k_pole, p)
        b_eq = jnp.tile(b_eq, (1, p))
        b_pole = jnp.tile(b_pole, (1, p))
        b, cin, cout = b // p, p * cin, p * cout
    ext = ext_strips(x)  # (B, 6, 4, n+2, C) — corner ghosts included
    kernel = functools.partial(_kernel, n=n)
    flops = 2 * b * 6 * n * n * 9 * cin * cout
    out = pl.pallas_call(
        kernel,
        grid=(b, 6),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n, n, cin), lambda i, f: (i, f, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 4, n + 2, cin), lambda i, f: (i, f, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n, n, cout), lambda i, f: (i, f, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 6, n, n, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2, cin), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, ext, k_eq, k_pole, b_eq, b_pole)
    return packing.unpack_batch(out, p) if p > 1 else out


def _bwd_dx_kernel(dout_ref, kTeq_ref, kTpo_ref, dxp_ref, dpad, *, n):
    """Padded-input cotangent for one (batch, face) block.

    ``dxp[a, b] = sum_taps K[dy,dx]^T dout[a-dy, b-dx]`` via 9 shifted MXU
    contractions over a zero-extended dout tile.  Its interior is dx's
    local part; its boundary ring is the ext-strip cotangent, folded back
    through Eᵀ in XLA.  (Split from the dw kernel: the combined live set
    exceeded the 16 MB scoped-VMEM budget at the 32-channel level.)
    """
    cin = dxp_ref.shape[-1]
    f = pl.program_id(1)
    is_equatorial = f < 4
    dpad[:, :, :] = jnp.zeros(dpad.shape, dpad.dtype)
    dpad[2 : n + 2, 2 : n + 2, :] = dout_ref[0, 0]
    acc = jnp.zeros((n + 2, n + 2, cin), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tile = dpad[2 - dy : n + 4 - dy, 2 - dx : n + 4 - dx, :]
            k = jnp.where(is_equatorial, kTeq_ref[dy, dx], kTpo_ref[dy, dx])
            acc += jax.lax.dot_general(
                tile,
                k,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    dxp_ref[0, 0] = acc.astype(dxp_ref.dtype)


def _bwd_dw_kernel(x_ref, ext_ref, dout_ref, dcols_ref, keq_ref, kpo_ref,
                   dk_ref, db_ref, xpad, *, n):
    """Per-(batch, face) weight/bias gradient blocks.

    Emits ``dk (1,1,3,3,Cin,Cout)`` / ``db (1,1,1,Cout)`` per grid step and
    lets XLA reduce over (batch, face-group) — a constant-index accumulated
    output was measured to SERIALIZE the grid pipeline (train bwd 19 ms vs
    9 ms).  ``dK[dy,dx] = sum_pixels xpad_shifted (x) dout`` as flattened
    single-contracting-dim matmuls (Mosaic cannot lower a 2-contracting-dim
    tpu.matmul — tools/mosaic_bisect3).  ``dcols`` carries dout's W/E
    boundary columns (XLA-sliced — Mosaic cannot index bf16 sublane
    columns), restoring the ghost-column taps the zero W/E columns miss.
    """
    cin = x_ref.shape[-1]
    # assemble xpad exactly like the forward (W/E columns zero)
    xpad[:, :, :] = jnp.zeros(xpad.shape, xpad.dtype)
    xpad[1 : n + 1, 1 : n + 1, :] = x_ref[0, 0]
    xpad[0, :, :] = ext_ref[0, 0, 0]
    xpad[n + 1, :, :] = ext_ref[0, 0, 1]
    row2 = lax.broadcasted_iota(jnp.int32, (n + 2, 1), 0)
    interior = jnp.logical_and(row2 > 0, row2 < n + 1)
    w_strip = jnp.where(interior, ext_ref[0, 0, 2], 0).astype(xpad.dtype)
    e_strip = jnp.where(interior, ext_ref[0, 0, 3], 0).astype(xpad.dtype)
    dout = dout_ref[0, 0]
    cout = dout.shape[-1]
    dout_flat = dout.reshape(n * n, cout)
    for dy in range(3):
        for dx in range(3):
            tile = xpad[dy : dy + n, dx : dx + n, :].reshape(n * n, cin)
            g = jax.lax.dot_general(
                tile, dout_flat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Cin, Cout)
            # ghost-column restoration: tap (dy, dx=0) also read padded
            # column 0 (the W ghost) at output column 0; mirror for dx=2.
            if dx == 0:
                g += jax.lax.dot_general(
                    w_strip[dy : dy + n], dcols_ref[0, 0, 0],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if dx == 2:
                g += jax.lax.dot_general(
                    e_strip[dy : dy + n], dcols_ref[0, 0, 1],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dk_ref[0, 0, dy, dx] = g
    db_ref[0, 0] = jnp.sum(
        jnp.sum(dout.astype(jnp.float32), axis=0), axis=0, keepdims=True
    )


def _blk_spec(shape):
    return pl.BlockSpec(
        shape, lambda i, f: (i, f) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM,
    )


def _dx_via_kernel(x_shape, x_dtype, k_eq, k_pole, g, interpret):
    """Input cotangent via the Pallas dxp kernel + scatter-free Eᵀ fold.

    One pallas_call (same cost class as the fused forward) instead of the
    XLA composition's ~15 small ops; shared by the "hybrid" and "fused"
    backward modes.
    """
    from dlwp_cs_tpu.ops.halo import _ext_transpose

    b, _, n, _, cin = x_shape
    cout = k_eq.shape[-1]
    dt = x_dtype
    g = g.astype(dt)
    # channel-transposed kernels for the dxp correlation (dxp[a,b] =
    # sum_taps K[dy,dx]^T dout[a-dy, b-dx] — no spatial flip: the shifted
    # dpad slices realize the -dy/-dx offsets directly)
    kT_eq = k_eq.astype(dt).swapaxes(2, 3)
    kT_po = k_pole.astype(dt).swapaxes(2, 3)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    dxp = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, n=n),
        grid=(b, 6),
        in_specs=[_blk_spec((1, 1, n, n, cout)), full, full],
        out_specs=_blk_spec((1, 1, n + 2, n + 2, cin)),
        out_shape=jax.ShapeDtypeStruct((b, 6, n + 2, n + 2, cin), dt),
        scratch_shapes=[pltpu.VMEM((n + 4, n + 4, cout), dt)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 6 * (n + 2) * (n + 2) * 9 * cin * cout,
            bytes_accessed=2 * b * 6 * n * n * cin * jnp.dtype(dt).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g, kT_eq, kT_po)
    # dx = interior of dxp + E^T of the boundary-ring cotangent
    dx = dxp[:, :, 1 : n + 1, 1 : n + 1, :]
    zero_ends = jnp.ones((n + 2, 1), dxp.dtype).at[0, 0].set(0).at[n + 1, 0].set(0)
    d_ext = jnp.stack(
        [
            dxp[:, :, 0, :, :],                      # S row (incl. corners)
            dxp[:, :, n + 1, :, :],                  # N row (incl. corners)
            dxp[:, :, :, 0, :] * zero_ends,          # W col (interior only)
            dxp[:, :, :, n + 1, :] * zero_ends,      # E col (interior only)
        ],
        axis=2,
    )  # (B, 6, 4, n+2, Cin)
    return dx + _ext_transpose(d_ext)


def _backward_all(x, ext, k_eq, k_pole, g, interpret):
    b, _, n, _, cin = x.shape
    cout = k_eq.shape[-1]
    dt = x.dtype
    g = g.astype(dt)
    k_eq = k_eq.astype(dt)
    k_pole = k_pole.astype(dt)
    dcols = jnp.stack([g[:, :, :, 0, :], g[:, :, :, n - 1, :]], axis=2)
    blk = _blk_spec
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    dx = _dx_via_kernel(x.shape, x.dtype, k_eq, k_pole, g, interpret)
    dk_all, db_all = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, n=n),
        grid=(b, 6),
        in_specs=[
            blk((1, 1, n, n, cin)),
            blk((1, 1, 4, n + 2, cin)),
            blk((1, 1, n, n, cout)),
            blk((1, 1, 2, n, cout)),
            full,
            full,
        ],
        out_specs=(
            blk((1, 1, 3, 3, cin, cout)),
            blk((1, 1, 1, cout)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 6, 3, 3, cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, 6, 1, cout), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2, cin), dt)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 6 * n * n * 9 * cin * cout,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, ext, g, dcols, k_eq, k_pole)
    dkeq = jnp.sum(dk_all[:, :4], axis=(0, 1))
    dkpo = jnp.sum(dk_all[:, 4:], axis=(0, 1))
    dbeq = jnp.sum(db_all[:, :4], axis=(0, 1))
    dbpo = jnp.sum(db_all[:, 4:], axis=(0, 1))
    return dx, dkeq, dkpo, dbeq, dbpo


def _xla_reference(x, k_eq, k_pole, b_eq, b_pole):
    from dlwp_cs_tpu.ops.ringfix import cs_conv3x3_ringfix

    return cs_conv3x3_ringfix(
        x, k_eq, k_pole, bias_eq=b_eq, bias_pole=b_pole
    )


def _fwd(x, k_eq, k_pole, b_eq, b_pole, interpret, fused_backward):
    out = _forward(x, k_eq, k_pole, b_eq, b_pole, interpret)
    return out, (x, k_eq, k_pole, b_eq, b_pole)


def _bwd(interpret, fused_backward, res, g):
    x, k_eq, k_pole, b_eq, b_pole = res
    mode = {False: "xla", True: "fused"}.get(fused_backward, fused_backward)
    if mode not in _BWD_MODES:
        raise ValueError(f"unknown pallas backward mode {fused_backward!r}")
    if mode == "xla":
        # Exact VJP of the identical linear+bias map via the scatter-free
        # XLA ring-fix composition (ext_strips carries its transpose-gather
        # VJP; the unused primal is dead-code-eliminated by XLA).
        _, pullback = jax.vjp(_xla_reference, x, k_eq, k_pole, b_eq, b_pole)
        return pullback(g)
    if mode == "split":
        # Hand-derived split VJP (ops.ring_kernel): XLA's own SAME-conv VJP
        # (unpacked — the corrected micro-timing's winner) + explicit ring
        # transpose + scatter-free Eᵀ fold.
        from dlwp_cs_tpu.ops.ring_kernel import split_vjp

        return split_vjp(x, k_eq, k_pole, b_eq, b_pole, g)
    if mode == "packdw":
        # Decomposed backward: dx through the full composition VJP as in
        # "xla" (the fix-transpose machinery has no cheaper form), but the
        # DOMINANT weight-gradient contraction — the SAME-conv filter grad,
        # a (pixels, Cin)^T (pixels, Cout) product that fills 32/128 of the
        # MXU at the U-Net's outer levels — runs in the batch->lane packed
        # layout (405 -> 230 us at n=48/c=32, tools/kernel_variants.py).
        # pack(x) is the same op the packed forward ran, so XLA CSE shares
        # it; pack(g) is the one extra relayout this mode pays.
        from dlwp_cs_tpu.ops.ringfix import _same_conv, ring_term

        _, pull_x = jax.vjp(
            lambda v: _xla_reference(v, k_eq, k_pole, b_eq, b_pole), x
        )
        (dx,) = pull_x(g)
        b, _, n, _, cin = x.shape
        cout = k_eq.shape[-1]
        p = _pack_factor(b, n, cin, cout, jnp.dtype(x.dtype).itemsize)

        def base_w(ke, kp):
            if p > 1:
                xp = packing.pack_batch(x, p)
                return jnp.concatenate(
                    [
                        _same_conv(xp[:, :4], packing.block_diag_taps(ke, p)),
                        _same_conv(xp[:, 4:], packing.block_diag_taps(kp, p)),
                    ],
                    axis=1,
                )
            return jnp.concatenate(
                [_same_conv(x[:, :4], ke), _same_conv(x[:, 4:], kp)], axis=1
            )

        gp = packing.pack_batch(g, p) if p > 1 else g
        _, pull_bw = jax.vjp(base_w, k_eq, k_pole)
        dke_b, dkp_b = pull_bw(gp.astype(x.dtype))
        _, pull_rw = jax.vjp(
            lambda ke, kp: ring_term(x, ke, kp), k_eq, k_pole
        )
        dke_r, dkp_r = pull_rw(g.astype(x.dtype))
        g32 = g.astype(jnp.float32)
        dbeq = jnp.sum(g32[:, :4], axis=(0, 1, 2, 3)).astype(b_eq.dtype)
        dbpo = jnp.sum(g32[:, 4:], axis=(0, 1, 2, 3)).astype(b_pole.dtype)
        return dx, dke_b + dke_r, dkp_b + dkp_r, dbeq, dbpo
    if mode == "hybrid":
        # dx via ONE Pallas kernel (the expensive composition half: the
        # XLA dx path re-runs the whole halo machinery in transpose);
        # weight/bias grads via the XLA VJP restricted to the weight
        # arguments — those are clean batched contractions XLA already
        # emits as fused transpose matmuls, and skipping the all-Pallas dw
        # kernel avoids its (B, 6, 3, 3, Cin, Cout) HBM round-trip (the
        # reason the "fused" mode measured slower — module docstring).
        dx = _dx_via_kernel(x.shape, x.dtype, k_eq, k_pole, g, interpret)
        _, pullback = jax.vjp(
            lambda ke, kp, be, bp: _xla_reference(x, ke, kp, be, bp),
            k_eq, k_pole, b_eq, b_pole,
        )
        dkeq, dkpo, dbeq, dbpo = pullback(g)
        return dx, dkeq, dkpo, dbeq, dbpo
    ext = ext_strips(x)
    dx, dkeq, dkpo, dbeq, dbpo = _backward_all(
        x, ext, k_eq, k_pole, g, interpret
    )
    return (
        dx,
        dkeq.astype(k_eq.dtype),
        dkpo.astype(k_pole.dtype),
        dbeq.reshape(-1).astype(k_eq.dtype),
        dbpo.reshape(-1).astype(k_pole.dtype),
    )


cs_conv3x3_pallas.defvjp(_fwd, _bwd)
