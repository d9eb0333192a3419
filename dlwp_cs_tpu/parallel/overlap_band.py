"""M6 overlap kernel: fused band conv with IN-FLIGHT band-row RDMA.

SURVEY.md §7 M6's defining feature — "Pallas kernels using async remote
copies so the interior stencil computes while edge halos are in flight" —
fusing :mod:`dlwp_cs_tpu.parallel.pallas_band` (the shard-local fused VMEM
band conv) with :mod:`dlwp_cs_tpu.parallel.rdma_halo` (the
``make_async_remote_copy`` band exchange).  VERDICT r4 next #2.

One ``pallas_call`` per conv, grid ``(batch, face)``:

1. grid step (0, 0) barriers with both ring neighbors, then ``start()`` s
   the two remote copies — the local top row slab to the +1 neighbor's
   ``below`` scratch, the bottom slab to the -1 neighbor's ``above``
   scratch — riding both ICI directions at once;
2. EVERY grid step assembles its padded face band in VMEM with ZERO ghost
   rows and computes all 9 shifted MXU contractions plus the W/E
   ghost-column corrections — none of which depend on the in-flight
   transfers (output rows ``1..h-2`` are complete after this phase);
3. grid step (0, 0) ``wait()`` s — every later step is ordered after it on
   the sequential core — and each step then adds the two boundary-row
   corrections (3 small dots per ghost row) from the received slabs.

Division of labor with :func:`dlwp_cs_tpu.parallel.halo.halo_pieces`: the
SEAM collectives (polar psum broadcast, tiled all_gather, end-pair
ppermute) and all topology/orientation logic stay in XLA — computed with
the band transport set to ``"zero"``, so they carry no data dependence on
the band rows and XLA can overlap them too.  What moves in-kernel is
exactly the per-conv, every-shard band-row traffic plus the 4 ghost-row
corner cells that depend on it (equatorial faces read their ring
neighbors' received rows; polar-face and global-corner values arrive
precomputed in the seam rows).

Backward: the exact composition VJP through the scatter-free band
ring-fix formulation, as for the non-overlapped band kernel
(:func:`dlwp_cs_tpu.parallel.pallas_band.band_conv3x3_pallas`) — the
linear map is identical.

Correctness is pinned in interpret mode on the 8-device CPU mesh
(tests/test_overlap_band.py) against the single-device conv; real-ICI
overlap numbers need the multi-chip hardware this environment lacks
(PERF.md).

Constraint: differentiating through this conv requires the surrounding
computation to be ``jit``-compiled.  EAGER ``shard_map`` transposition
re-executes the body one shard at a time to rematerialize residuals, so
the kernel's cross-shard barrier waits on peers that are never concurrently
running (observed deadlock, CPU interpret mode); under ``jit`` — the only
mode that exists on real hardware — the transposed program compiles per
device and every shard runs concurrently.  Training steps are always
jitted, so this only affects debugging at the REPL.

Reference parity: CubeSpherePadding2D + CubeSphereConv2D under domain
decomposition (``DLWP/custom.py`` — SURVEY.md §2 rows 1-2, §5.7); the
reference has no distributed mode at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlwp_cs_tpu.geometry.cubed_sphere import EDGE_E, EDGE_W
from dlwp_cs_tpu.ops.packing import block_diag_taps, pack_batch, unpack_batch
from dlwp_cs_tpu.ops.padding import padding_plan
from dlwp_cs_tpu.ops.pallas_conv import _pack_factor
from dlwp_cs_tpu.parallel.halo import halo_pieces, use_band_exchange
from dlwp_cs_tpu.parallel.mesh import SPATIAL_AXIS
from dlwp_cs_tpu.parallel.pallas_band import band_pallas_supported

__all__ = [
    "band_conv3x3_overlap",
    "make_overlap_conv3x3",
    "overlap_supported",
]

# Mosaic collective-kernel id (distinct from rdma_halo's 13: the two could
# appear in one program if the pad path uses the standalone exchange).
_COLLECTIVE_ID = 14


def _eq_corner_table(n: int):
    """Per-face (partner_face, partner_col_is_east) for the W/E ghost-row
    corner cells of the 4 equatorial faces.

    The equatorial ring seams are col<->col with ``reverse=False``
    (asserted by ``halo._check_topology``), so the ghost corner beyond
    edge W/E of face f at a band-halo row is the W/E partner face's column
    0 / n-1 value AT THAT SAME ROW — i.e. an entry of the partner face's
    received band slab.  Polar faces' corners come from the seam rows
    instead (src-strip values, XLA-precomputed).
    """
    table = padding_plan(n, 1).table
    pf_w, pe_w, pf_e, pe_e = [], [], [], []
    for f in range(4):
        lw = table[f][EDGE_W]
        le = table[f][EDGE_E]
        pf_w.append(lw.face)
        pe_w.append(1 if lw.edge == EDGE_E else 0)
        pf_e.append(le.face)
        pe_e.append(1 if le.edge == EDGE_E else 0)
    return tuple(pf_w + [0, 0]), tuple(pe_w + [0, 0]), \
        tuple(pf_e + [0, 0]), tuple(pe_e + [0, 0])


def _kernel(
    x_ref, seam_ref, we_ref, tslab_ref, bslab_ref,
    keq_ref, kpo_ref, beq_ref, bpo_ref, out_ref,
    xpad, below_buf, above_buf, send_up, recv_up, send_dn, recv_dn,
    *, n, h, axis_name, n_shards, corners,
):
    i = pl.program_id(0)
    f = pl.program_id(1)
    cout = out_ref.shape[-1]
    s = lax.axis_index(axis_name)
    right = lax.rem(s + 1, n_shards)
    left = lax.rem(s + n_shards - 1, n_shards)
    step0 = jnp.logical_and(i == 0, f == 0)

    def copies():
        up = pltpu.make_async_remote_copy(
            src_ref=tslab_ref, dst_ref=below_buf,
            send_sem=send_up, recv_sem=recv_up,
            device_id={axis_name: right},
        )
        dn = pltpu.make_async_remote_copy(
            src_ref=bslab_ref, dst_ref=above_buf,
            send_sem=send_dn, recv_sem=recv_dn,
            device_id={axis_name: left},
        )
        return up, dn

    @pl.when(step0)
    def _start():
        # Neighbor barrier before writing into a peer (guide pattern; with
        # n_shards == 2 both signals land on the one peer, which waits 2).
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id={axis_name: left})
        pltpu.semaphore_signal(barrier, inc=1, device_id={axis_name: right})
        pltpu.semaphore_wait(barrier, 2)
        up, dn = copies()
        up.start()
        dn.start()

    is_eq = f < 4

    def kk(dy, dx):
        return jnp.where(is_eq, keq_ref[dy, dx], kpo_ref[dy, dx])

    # ---- phase A: interior taps, overlapped with the in-flight DMAs ------
    # Padded band with ZERO ghost rows: tap (0, *) / (2, *) reads of padded
    # rows 0 / h+1 contribute nothing yet; phase B adds exactly those.
    xpad[:, :, :] = jnp.zeros(xpad.shape, xpad.dtype)
    xpad[1 : h + 1, 1 : n + 1, :] = x_ref[0, 0]
    acc = jnp.zeros((h, n, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc += jax.lax.dot_general(
                xpad[dy : dy + h, dx : dx + n, :],
                kk(dy, dx),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # W/E ghost-column corrections for the interior rows (positions 1..h of
    # the strips; the halo-row entries at 0/h+1 belong to the ghost rows).
    row2 = lax.broadcasted_iota(jnp.int32, (h + 2, 1), 0)
    interior = jnp.logical_and(row2 > 0, row2 < h + 1)
    w_strip = jnp.where(interior, we_ref[0, 0, 0, : h + 2], 0).astype(xpad.dtype)
    e_strip = jnp.where(interior, we_ref[0, 0, 1, : h + 2], 0).astype(xpad.dtype)
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
    bias = jnp.where(is_eq, beq_ref[:], bpo_ref[:])
    acc += bias[None].astype(jnp.float32)

    # ---- phase B: wait once, then the boundary-row taps ------------------
    @pl.when(step0)
    def _wait():
        up, dn = copies()
        up.wait()
        dn.wait()

    is_first = s == 0
    is_last = s == n_shards - 1
    not_eq = jnp.logical_not(is_eq)
    topo_bot = seam_ref[0, 0, 0]  # (n+2, C): valid at 1..n on the first
    topo_top = seam_ref[0, 0, 1]  # shard; corners valid except eq-interior
    ring_bot = below_buf[i, f, 0]  # (n, C) received from the -1 neighbor
    ring_top = above_buf[i, f, 0]

    # equatorial ghost-row corners: the W/E partner face's received row at
    # its seam column (static per-face table, selected by the face id).
    pf_w, pe_w, pf_e, pe_e = corners
    fw = fe = jnp.int32(0)
    ew = ee = jnp.int32(0)
    for k in range(6):
        fw = jnp.where(f == k, pf_w[k], fw)
        ew = jnp.where(f == k, pe_w[k], ew)
        fe = jnp.where(f == k, pf_e[k], fe)
        ee = jnp.where(f == k, pe_e[k], ee)

    def seam_col(buf, pf, is_east):
        row = buf[i, pf, 0]  # (n, C)
        return jnp.where(is_east == 1, row[n - 1 : n], row[0:1])  # (1, C)

    bc_w = jnp.where(
        jnp.logical_or(is_first, not_eq), topo_bot[0:1],
        seam_col(below_buf, fw, ew),
    )
    bc_e = jnp.where(
        jnp.logical_or(is_first, not_eq), topo_bot[n + 1 : n + 2],
        seam_col(below_buf, fe, ee),
    )
    tc_w = jnp.where(
        jnp.logical_or(is_last, not_eq), topo_top[0:1],
        seam_col(above_buf, fw, ew),
    )
    tc_e = jnp.where(
        jnp.logical_or(is_last, not_eq), topo_top[n + 1 : n + 2],
        seam_col(above_buf, fe, ee),
    )
    bot_mid = jnp.where(is_first, topo_bot[1 : n + 1], ring_bot)
    top_mid = jnp.where(is_last, topo_top[1 : n + 1], ring_top)
    bot_row = jnp.concatenate([bc_w, bot_mid, bc_e], axis=0)  # (n+2, C)
    top_row = jnp.concatenate([tc_w, top_mid, tc_e], axis=0)

    c0 = jnp.zeros((n, cout), jnp.float32)
    ch = jnp.zeros((n, cout), jnp.float32)
    for dx in range(3):
        c0 += jax.lax.dot_general(
            bot_row[dx : dx + n].astype(xpad.dtype), kk(0, dx),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ch += jax.lax.dot_general(
            top_row[dx : dx + n].astype(xpad.dtype), kk(2, dx),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    rowi = lax.broadcasted_iota(jnp.int32, (h, n, 1), 0)
    acc += jnp.where(rowi == 0, c0[None], 0.0)
    acc += jnp.where(rowi == h - 1, ch[None], 0.0)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _seam_ext(x, *, axis_name, n_shards):
    """XLA-side seam material, independent of the band-row transfers.

    Runs :func:`halo_pieces` with the band transport set to ``"zero"`` —
    the seam collectives (psum / tiled all_gather / end-pair ppermute) and
    every orientation rule execute exactly as in the production sharded
    pad, but the returned strips carry ZEROS wherever a value would have
    depended on the band exchange (eq-interior ghost-row cells); the
    kernel fills those from its received slabs.
    """
    b, nf, h, n, c = x.shape
    with use_band_exchange("zero"):
        bottom, top, west, east = halo_pieces(
            x, 1, axis_name=axis_name, n_shards=n_shards
        )
    seam = jnp.stack([bottom[:, :, 0], top[:, :, 0]], axis=2)

    def we(col):  # (B, 6, h, 1, C) -> (B, 6, n+2, C) at positions 1..h
        return jnp.pad(
            col[:, :, :, 0], ((0, 0), (0, 0), (1, n + 1 - h), (0, 0))
        )

    wecols = jnp.stack([we(west), we(east)], axis=2)
    return seam, wecols


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def band_conv3x3_overlap(
    x, k_eq, k_pole, b_eq, b_pole, axis_name, n_shards, interpret=False
):
    """Fused CS band conv with in-kernel band-row RDMA (module docstring).

    Same contract as
    :func:`dlwp_cs_tpu.parallel.pallas_band.band_conv3x3_pallas`: ``x`` is
    the shard-local row band ``(B, 6, h, n, C)``, called inside
    ``shard_map`` over ``axis_name`` (size ``n_shards >= 2``); returns the
    corresponding band of the single-device ``cs_conv``.
    """
    return _forward(x, k_eq, k_pole, b_eq, b_pole, axis_name, n_shards,
                    interpret)


def _forward(x, k_eq, k_pole, b_eq, b_pole, axis_name, n_shards, interpret):
    b, nf, h, n, cin = x.shape
    if nf != 6 or h * n_shards != n:
        raise ValueError(
            f"expected local band (B, 6, n/{n_shards}, n, C), got {x.shape}"
        )
    if n_shards < 2:
        raise ValueError("overlap kernel needs n_shards >= 2")
    cout = k_eq.shape[-1]
    k_eq = k_eq.astype(x.dtype)
    k_pole = k_pole.astype(x.dtype)
    b_eq = b_eq.reshape(1, cout).astype(x.dtype)
    b_pole = b_pole.reshape(1, cout).astype(x.dtype)
    p = _pack_factor(b, n, cin, cout, jnp.dtype(x.dtype).itemsize, h=h)
    if p > 1:
        x = pack_batch(x, p)
        k_eq = block_diag_taps(k_eq, p)
        k_pole = block_diag_taps(k_pole, p)
        b_eq = jnp.tile(b_eq, (1, p))
        b_pole = jnp.tile(b_pole, (1, p))
        b, cin, cout = b // p, p * cin, p * cout

    seam, wecols = _seam_ext(x, axis_name=axis_name, n_shards=n_shards)
    tslab = x[:, :, h - 1 :]  # (B, 6, 1, n, C) -> +1 neighbor's `below`
    bslab = x[:, :, :1]       # (B, 6, 1, n, C) -> -1 neighbor's `above`

    kernel = functools.partial(
        _kernel, n=n, h=h, axis_name=axis_name, n_shards=n_shards,
        corners=_eq_corner_table(n),
    )
    blk = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, f: (i, f) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * b * 6 * h * n * 9 * cin * cout
    out = pl.pallas_call(
        kernel,
        grid=(b, 6),
        in_specs=[
            blk((1, 1, h, n, cin)),
            blk((1, 1, 2, n + 2, cin)),
            blk((1, 1, 2, n + 2, cin)),
            full, full, full, full, full, full,
        ],
        out_specs=blk((1, 1, h, n, cout)),
        out_shape=jax.ShapeDtypeStruct((b, 6, h, n, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, n + 2, cin), x.dtype),
            pltpu.VMEM((b, 6, 1, n, cin), x.dtype),
            pltpu.VMEM((b, 6, 1, n, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=_COLLECTIVE_ID, has_side_effects=True
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, seam, wecols, tslab, bslab, k_eq, k_pole, b_eq, b_pole)
    return unpack_batch(out, p) if p > 1 else out


def _reference(x, k_eq, k_pole, b_eq, b_pole, axis_name, n_shards):
    from dlwp_cs_tpu.parallel.overlap import sharded_ringfix_conv3x3

    return sharded_ringfix_conv3x3(
        x, k_eq, k_pole, b_eq, b_pole, axis_name=axis_name, n_shards=n_shards
    )


def _fwd(x, k_eq, k_pole, b_eq, b_pole, axis_name, n_shards, interpret):
    out = _forward(x, k_eq, k_pole, b_eq, b_pole, axis_name, n_shards,
                   interpret)
    return out, (x, k_eq, k_pole, b_eq, b_pole)


def _bwd(axis_name, n_shards, interpret, res, g):
    # Exact VJP of the identical linear+bias map via the scatter-free band
    # ring-fix composition (as for band_conv3x3_pallas).
    x, k_eq, k_pole, b_eq, b_pole = res
    _, pullback = jax.vjp(
        lambda *a: _reference(*a, axis_name, n_shards),
        x, k_eq, k_pole, b_eq, b_pole,
    )
    return pullback(g)


band_conv3x3_overlap.defvjp(_fwd, _bwd)


def overlap_supported(
    x_shape, n_shards: int, dtype, cout: int | None = None
) -> bool:
    """Is the overlap kernel applicable to local blocks of this shape?

    The VMEM budget adds the two received-slab scratches and the two slab
    inputs to the band kernel's estimate (which itself includes the f32
    tap-accumulation stack for the real ``cout``).
    """
    if n_shards < 2:
        return False
    if not band_pallas_supported(x_shape, n_shards, dtype, cout=cout):
        return False
    b, nf, h, n, c = x_shape
    co = c if cout is None else int(cout)
    p = _pack_factor(b, n, c, co, jnp.dtype(dtype).itemsize, h=h)
    slabs = 4 * (b // p) * 6 * n * (p * c) * jnp.dtype(dtype).itemsize
    return slabs < 4 * 2**20


def make_overlap_conv3x3(
    n_shards: int, axis_name: str = SPATIAL_AXIS, *, interpret: bool = False
):
    """Closure for :func:`dlwp_cs_tpu.ops.conv.use_conv3x3_impl`.

    Falls back to the band ring-fix conv for shapes the kernel cannot take
    (n_shards == 1, thin bands, channels past the VMEM gate, f64 tests).
    """

    def conv(x, k_eq, k_pole, bias_eq, bias_pole):
        if not overlap_supported(x.shape, n_shards, x.dtype,
                                 cout=k_eq.shape[-1]):
            from dlwp_cs_tpu.parallel.overlap import sharded_ringfix_conv3x3

            return sharded_ringfix_conv3x3(
                x, k_eq, k_pole, bias_eq, bias_pole,
                axis_name=axis_name, n_shards=n_shards,
            )
        cout = k_eq.shape[-1]
        zb = jnp.zeros((cout,), x.dtype)
        return band_conv3x3_overlap(
            x,
            k_eq,
            k_pole,
            zb if bias_eq is None else bias_eq,
            zb if bias_pole is None else bias_pole,
            axis_name,
            n_shards,
            interpret,
        )

    return conv
