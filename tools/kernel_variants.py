"""Hardware experiments: MXU packing variants for the small-channel CS conv.

The base fused kernel runs 9 (n, n, Cin) x (Cin, Cout) taps; at the U-Net's
outer levels (Cin = Cout = 32) that underfills the 128x128 MXU ~16x
(measured 5.4 TF/s at n=48/c=32 vs 71.9 TF/s at n=12/c=128).  Variants:

  base     - the production kernel (ops.pallas_conv._kernel)
  npack    - tap-packed (Cin, 9*Cout) product + lane-sliced shift-add,
             with vmem_limit_bytes raised (default 16 MB budget OOMs)
  bdpack   - batch->lane block-diagonal packing: 4 batch items packed into
             the lane dim (C 32->128), block-diag (128, 128) tap weights,
             base kernel shape; XLA-side pack/unpack transposes included
  bdonly   - bdpack kernel WITHOUT the pack/unpack transposes (bound)

Each variant is checked allclose against the base kernel, then timed with
the chained-scan methodology.  Run ON TPU: ``python tools/kernel_variants.py``.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlwp_cs_tpu.ops import pallas_conv as pc
from dlwp_cs_tpu.ops.halo import ext_strips

CHAIN, REPEATS = 50, 5
N, C, B = 48, 32, 16
PACK = 4  # batch items packed into lanes for bdpack


def _wall(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def time_chain(fn, x, t_over):
    @jax.jit
    def run(v):
        def body(c, _):
            out = fn(v + c.astype(v.dtype))
            return jnp.mean(out).astype(jnp.float32), None

        c, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=CHAIN)
        return c

    out = run(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return max((best - t_over) / CHAIN, 1e-9)


def call_kernel(kernel_fn, x, ext, ke, kp, be, bp, cout, *, vmem_mb=None,
                scratch_dtype=None):
    b, _, n, _, cin = x.shape
    kwargs = {}
    if vmem_mb is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 2**20
        )
    return pl.pallas_call(
        functools.partial(kernel_fn, n=n),
        grid=(b, 6),
        in_specs=[
            pl.BlockSpec((1, 1, n, n, cin), lambda i, f: (i, f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, n + 2, cin), lambda i, f: (i, f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, n, cout), lambda i, f: (i, f, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 6, n, n, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2, cin), scratch_dtype or x.dtype)],
        **kwargs,
    )(x, ext, ke, kp, be, bp)


# the production layout contract — measure what production dispatches
from dlwp_cs_tpu.ops.packing import (  # noqa: E402
    block_diag_taps as block_diag_kernel,
    pack_batch,
    unpack_batch,
)


def main() -> int:
    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.zeros(())))
    t_over = min(_wall(lambda: float(trivial(jnp.zeros(())))) for _ in range(5))
    print(f"platform={jax.devices()[0].platform} overhead={t_over * 1e3:.1f}ms",
          flush=True)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, 6, N, N, C)), dtype=dt)
    ke = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.2, dtype=dt)
    kp = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.2, dtype=dt)
    be = jnp.zeros((1, C), dt)
    bp = jnp.zeros((1, C), dt)
    flops = 2 * B * 6 * N * N * 9 * C * C

    def base(v):
        return call_kernel(pc._kernel, v, ext_strips(v), ke, kp, be, bp, C)

    ref = np.asarray(base(x), np.float32)

    def report(name, fn, check=True):
        try:
            if check:
                got = np.asarray(fn(x), np.float32)
                err = float(np.max(np.abs(got - ref)))
            else:
                err = float("nan")
            t = time_chain(fn, x, t_over)
            print(f"{name:10s} {t * 1e6:8.1f} us/conv  {flops / t / 1e12:6.1f} TF/s"
                  f"  maxerr={err:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001 - experiment harness
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    report("base", base)

    # --- npack with raised scoped-vmem limit ------------------------------
    ke9 = ke.transpose(2, 0, 1, 3).reshape(C, 9 * C)
    kp9 = kp.transpose(2, 0, 1, 3).reshape(C, 9 * C)

    def npack(v):
        return call_kernel(pc._kernel_npack, v, ext_strips(v), ke9, kp9,
                           be, bp, C, vmem_mb=64)

    report("npack64M", npack)

    # --- batch->lane block-diagonal packing -------------------------------
    keb = block_diag_kernel(ke, PACK)
    kpb = block_diag_kernel(kp, PACK)
    beb = jnp.zeros((1, PACK * C), dt)
    bpb = jnp.zeros((1, PACK * C), dt)

    def bd_core(vp):
        # ext strips are channel-agnostic: computing them on the packed
        # layout equals packing the unpacked strips
        return call_kernel(pc._kernel, vp, ext_strips(vp), keb, kpb,
                           beb, bpb, PACK * C)

    def bdpack(v):
        vp = pack_batch(v, PACK)
        return unpack_batch(bd_core(vp), PACK)

    report("bdpack", bdpack)

    xp = pack_batch(x, PACK)

    def bdonly(vp):
        return bd_core(vp)

    try:
        got = np.asarray(unpack_batch(bdonly(xp), PACK), np.float32)
        err = float(np.max(np.abs(got - ref)))
    except Exception as e:  # noqa: BLE001
        print(f"bdonly     FAILED: {type(e).__name__}: {str(e)[:300]}")
        err = None
    if err is not None:
        t = time_chain(bdonly, xp, t_over)
        print(f"{'bdonly':10s} {t * 1e6:8.1f} us/conv  {flops / t / 1e12:6.1f} TF/s"
              f"  maxerr={err:.3e}", flush=True)

    # --- packed im2col: ONE (n^2, 9*pC) x (9*pC, pC) dot per face ----------
    # VERDICT r2 next #1: lift the tap-dot formulation off its floor.  On
    # the PACKED layout each tap occupies a full 128-lane block, so the
    # im2col scratch writes are tile-aligned (the sub-tile lane slicing
    # that killed npack does not occur).  One K=9*pC dot loads the weights
    # once and streams the activations once.
    def _kernel_im2col(x_ref, ext_ref, keq_ref, kpo_ref, beq_ref, bpo_ref,
                       out_ref, xpad, col, *, n):
        cin = x_ref.shape[-1]
        cout = out_ref.shape[-1]
        f = pl.program_id(1)
        is_eq = f < 4
        xpad[:, :, :] = jnp.zeros(xpad.shape, xpad.dtype)
        xpad[1 : n + 1, 1 : n + 1, :] = x_ref[0, 0]
        xpad[0, :, :] = ext_ref[0, 0, 0]
        xpad[n + 1, :, :] = ext_ref[0, 0, 1]
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                col[:, :, t * cin : (t + 1) * cin] = xpad[dy : dy + n, dx : dx + n, :]
        kmat = jnp.where(is_eq, keq_ref[...], kpo_ref[...])  # (9*cin, cout)
        acc = jax.lax.dot_general(
            col[:, :, :], kmat,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        row2 = lax.broadcasted_iota(jnp.int32, (n + 2, 1), 0)
        interior = jnp.logical_and(row2 > 0, row2 < n + 1)
        w_strip = jnp.where(interior, ext_ref[0, 0, 2], 0).astype(xpad.dtype)
        e_strip = jnp.where(interior, ext_ref[0, 0, 3], 0).astype(xpad.dtype)
        cw = jnp.zeros((n, cout), jnp.float32)
        ce = jnp.zeros((n, cout), jnp.float32)
        for dy in range(3):
            tw = dy * 3 + 0
            te = dy * 3 + 2
            cw += jax.lax.dot_general(
                w_strip[dy : dy + n], kmat[tw * cin : (tw + 1) * cin],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ce += jax.lax.dot_general(
                e_strip[dy : dy + n], kmat[te * cin : (te + 1) * cin],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        colm = lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
        acc += jnp.where(colm == 0, cw[:, None, :], 0.0)
        acc += jnp.where(colm == n - 1, ce[:, None, :], 0.0)
        bias = jnp.where(is_eq, beq_ref[:], bpo_ref[:])
        acc += bias[None].astype(jnp.float32)
        out_ref[0, 0] = acc.astype(out_ref.dtype)

    kebm = keb.reshape(9 * PACK * C, PACK * C)
    kpbm = kpb.reshape(9 * PACK * C, PACK * C)

    def call_im2col(vp):
        b2, _, n2, _, cinp = vp.shape
        coutp = PACK * C
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_kernel_im2col, n=n2),
            grid=(b2, 6),
            in_specs=[
                pl.BlockSpec((1, 1, n2, n2, cinp), lambda i, f: (i, f, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 4, n2 + 2, cinp), lambda i, f: (i, f, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                full, full, full, full,
            ],
            out_specs=pl.BlockSpec((1, 1, n2, n2, coutp),
                                   lambda i, f: (i, f, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b2, 6, n2, n2, coutp), vp.dtype),
            scratch_shapes=[
                pltpu.VMEM((n2 + 2, n2 + 2, cinp), vp.dtype),
                pltpu.VMEM((n2, n2, 9 * cinp), vp.dtype),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        )(vp, ext_strips(vp), kebm, kpbm, beb, bpb)

    def im2col_pack(v):
        return unpack_batch(call_im2col(pack_batch(v, PACK)), PACK)

    report("im2col_p", im2col_pack)
    try:
        got = np.asarray(unpack_batch(call_im2col(xp), PACK), np.float32)
        err2 = float(np.max(np.abs(got - ref)))
        t = time_chain(call_im2col, xp, t_over)
        print(f"{'im2colonly':10s} {t * 1e6:8.1f} us/conv  "
              f"{flops / t / 1e12:6.1f} TF/s  maxerr={err2:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"im2colonly FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- packed XLA SAME conv (differentiable: would speed fwd AND VJP) ---
    from dlwp_cs_tpu.ops.ringfix import _same_conv

    def xla_same(v):
        return jnp.concatenate(
            [_same_conv(v[:, :4], ke), _same_conv(v[:, 4:], kp)], axis=1
        )

    def xla_same_packed(v):
        vp = pack_batch(v, PACK)
        out = jnp.concatenate(
            [_same_conv(vp[:, :4], keb), _same_conv(vp[:, 4:], kpb)], axis=1
        )
        return unpack_batch(out, PACK)

    report("xla_same", xla_same, check=False)
    report("xla_same_p", xla_same_packed, check=False)

    g = jnp.asarray(rng.normal(size=(B, 6, N, N, C)), dtype=dt)

    def vjp_of(fn):
        def run(v):
            _, pull = jax.vjp(fn, v)
            return pull(g)[0]
        return run

    report("vjp_same", vjp_of(xla_same), check=False)
    report("vjp_same_p", vjp_of(xla_same_packed), check=False)

    def vjp_w(fn_k):
        def run(v):
            _, pull = jax.vjp(lambda kk: fn_k(v, kk), ke)
            return pull(g)[0]
        return run

    def same_k(v, kk):
        return jnp.concatenate(
            [_same_conv(v[:, :4], kk), _same_conv(v[:, 4:], kk)], axis=1
        )

    def same_k_packed(v, kk):
        vp = pack_batch(v, PACK)
        eye = jnp.eye(PACK, dtype=kk.dtype)
        kb = jnp.einsum("ij,hwcd->hwicjd", eye, kk).reshape(
            3, 3, PACK * C, PACK * C
        )
        out = jnp.concatenate(
            [_same_conv(vp[:, :4], kb), _same_conv(vp[:, 4:], kb)], axis=1
        )
        return unpack_batch(out, PACK)

    report("dw_same", vjp_w(same_k), check=False)
    report("dw_same_p", vjp_w(same_k_packed), check=False)

    # --- dx kernel: misaligned (n+2, n+2) output vs aligned interior+ring --
    from dlwp_cs_tpu.ops.pallas_conv import _dx_via_kernel

    g = jnp.asarray(rng.normal(size=(B, 6, N, N, C)), dtype=dt)

    def dx_current_g(v):
        return _dx_via_kernel(v.shape, v.dtype, ke, kp, v, False)

    report("dx_cur", dx_current_g, check=False)

    def _dx_aligned_kernel(dout_ref, kTeq_ref, kTpo_ref, din_ref, dring_ref,
                           dpad):
        n = din_ref.shape[2]
        cin = din_ref.shape[-1]
        f = pl.program_id(1)
        is_eq = f < 4
        dpad[:, :, :] = jnp.zeros(dpad.shape, dpad.dtype)
        dpad[2 : n + 2, 2 : n + 2, :] = dout_ref[0, 0]
        acc = jnp.zeros((n + 2, n + 2, cin), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tile = dpad[2 - dy : n + 4 - dy, 2 - dx : n + 4 - dx, :]
                k = jnp.where(is_eq, kTeq_ref[dy, dx], kTpo_ref[dy, dx])
                acc += jax.lax.dot_general(
                    tile, k,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        din_ref[0, 0] = acc[1 : n + 1, 1 : n + 1].astype(din_ref.dtype)
        ring = jnp.stack(
            [acc[0], acc[n + 1], acc[:, 0], acc[:, n + 1]], axis=0
        )
        dring_ref[0, 0] = ring.astype(dring_ref.dtype)

    def dx_aligned(v):
        b, _, n, _, c = v.shape
        kT_eq = ke.swapaxes(2, 3)
        kT_po = kp.swapaxes(2, 3)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        din, dring = pl.pallas_call(
            _dx_aligned_kernel,
            grid=(b, 6),
            in_specs=[
                pl.BlockSpec((1, 1, n, n, c), lambda i, f: (i, f, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                full, full,
            ],
            out_specs=(
                pl.BlockSpec((1, 1, n, n, c), lambda i, f: (i, f, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 4, n + 2, c), lambda i, f: (i, f, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, 6, n, n, c), v.dtype),
                jax.ShapeDtypeStruct((b, 6, 4, n + 2, c), v.dtype),
            ),
            scratch_shapes=[pltpu.VMEM((n + 4, n + 4, c), v.dtype)],
        )(v, kT_eq, kT_po)
        return din + jnp.mean(dring) * 0

    report("dx_align", dx_aligned, check=False)

    # --- decoder-shape conv (cin=96, cout=32): cap-256 packing ------------
    C2 = 96
    xd = jnp.asarray(rng.normal(size=(B, 6, N, N, C2)), dtype=dt)
    ke2 = jnp.asarray(rng.normal(size=(3, 3, C2, C)) * 0.1, dtype=dt)
    be2 = jnp.zeros((1, C), dt)

    def dec_base(v):
        return call_kernel(pc._kernel, v, ext_strips(v), ke2, ke2, be2, be2, C)

    def dec_packed(v):
        vp = pack_batch(v, 2)
        kb = block_diag_kernel(ke2, 2)
        bb = jnp.zeros((1, 2 * C), dt)
        out = call_kernel(pc._kernel, vp, ext_strips(vp), kb, kb, bb, bb, 2 * C)
        return unpack_batch(out, 2)

    try:
        r0 = np.asarray(dec_base(xd), np.float32)
        r1 = np.asarray(dec_packed(xd), np.float32)
        print(f"dec maxerr={float(np.max(np.abs(r1 - r0))):.3e}", flush=True)
        t0 = time_chain(dec_base, xd, t_over)
        t1 = time_chain(dec_packed, xd, t_over)
        fl = 2 * B * 6 * N * N * 9 * C2 * C
        print(f"dec_base   {t0 * 1e6:8.1f} us  {fl / t0 / 1e12:5.1f} TF/s", flush=True)
        print(f"dec_pack2  {t1 * 1e6:8.1f} us  {fl / t1 / 1e12:5.1f} TF/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"dec FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- lane-offset store bisect (K-pack feasibility) --------------------
    def _store_kernel(x_ref, o_ref, xrow):
        n = x_ref.shape[2]
        xrow[:, :, 0:C] = x_ref[0, 0]
        xrow[:, :, C : 2 * C] = x_ref[0, 0]
        xrow[:, :, 2 * C : 3 * C] = x_ref[0, 0]
        o_ref[0, 0] = xrow[:, :, 0:C] + xrow[:, :, C : 2 * C] + xrow[:, :, 2 * C :]

    def lane_store(v):
        b, _, n, _, c = v.shape
        return pl.pallas_call(
            _store_kernel,
            grid=(b, 6),
            in_specs=[pl.BlockSpec((1, 1, n, n, c), lambda i, f: (i, f, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, n, n, c), lambda i, f: (i, f, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            scratch_shapes=[pltpu.VMEM((n, n, 3 * c), v.dtype)],
        )(v)

    try:
        got = np.asarray(lane_store(x), np.float32)
        err = float(np.max(np.abs(got - 3.0 * np.asarray(x, np.float32))))
        print(f"lane-offset bf16 stores: OK (maxerr={err:.3e})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"lane-offset bf16 stores: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
    return 0


def chain_experiment():
    """Does XLA cancel unpack->relu->pack between consecutive packed convs?

    conv-relu-conv vs 2x single-conv time: if the chain costs ~2x a single
    conv, the boundary transposes are NOT cancelled and a packed-resident
    model still has them on the table.
    """
    import jax

    from dlwp_cs_tpu.ops.pallas_conv import cs_conv3x3_pallas

    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.zeros(())))
    t_over = min(_wall(lambda: float(trivial(jnp.zeros(())))) for _ in range(5))
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, 6, N, N, C)), dtype=dt)
    ke = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.2, dtype=dt)
    kp = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.2, dtype=dt)
    zb = jnp.zeros((C,), dt)

    def single(v):
        return cs_conv3x3_pallas(v, ke, kp, zb, zb, False)

    def chain2(v):
        h = jax.nn.leaky_relu(single(v), 0.1)
        return single(h)

    t1 = time_chain(single, x, t_over)
    t2 = time_chain(chain2, x, t_over)
    print(f"single conv {t1 * 1e6:7.1f} us   conv-relu-conv {t2 * 1e6:7.1f} us"
          f"   ratio {t2 / t1:.2f} (2.0 = no transpose cancellation)",
          flush=True)


if __name__ == "__main__":
    if "--chain" in sys.argv:
        chain_experiment()
        sys.exit(0)
    sys.exit(main())
