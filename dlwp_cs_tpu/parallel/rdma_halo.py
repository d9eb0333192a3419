"""Band-row halo exchange as an in-kernel Pallas RDMA (SURVEY.md §7 M6).

The production sharded pad (:mod:`dlwp_cs_tpu.parallel.halo`) moves each
band's flanking rows with two ``lax.ppermute`` s and relies on XLA's
latency-hiding scheduler to overlap them with compute.  This module is the
hand-DMA alternative VERDICT r2 asked for (missing #2 / next #4): ONE
Pallas kernel per exchange that

* signals a neighbor barrier (both ring neighbors),
* starts the two ``pltpu.make_async_remote_copy`` transfers — my top rows
  to my +1 neighbor's ``below`` buffer and my bottom rows to my -1
  neighbor's ``above`` buffer, riding both ICI directions at once —
* and waits for its own sends and receives.

Because the copies are explicit DMAs with semaphores, a future fused
stencil kernel can ``start()`` them, compute its interior taps, and only
``wait()`` before the boundary taps — the ring-attention-style overlap the
XLA path can only hope the scheduler finds.  For now the kernel is a
drop-in replacement for the two ppermutes, selectable via
:func:`dlwp_cs_tpu.parallel.halo.use_band_exchange` and equivalence-tested
in the TPU *interpret* mode on the CPU mesh (multi-chip TPU hardware is
not available in this environment — PERF.md).

Addressing uses ``DeviceIdType.MESH`` with ``{axis: index}`` dicts, so the
kernel is correct under any surrounding mesh (the ``data`` axis coordinate
is implicitly "my own").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlwp_cs_tpu.parallel.mesh import SPATIAL_AXIS

__all__ = ["band_exchange_rdma"]

# Mosaic collective-kernel id for the band exchange (must agree across the
# devices participating in one call; distinct ids are only needed for
# *concurrent* collectives, and every exchange in a step runs in sequence).
_COLLECTIVE_ID = 13


def _kernel(
    top_ref,
    bot_ref,
    below_ref,
    above_ref,
    send_up,
    recv_up,
    send_dn,
    recv_dn,
    *,
    axis_name: str,
    n_shards: int,
):
    s = lax.axis_index(axis_name)
    right = lax.rem(s + 1, n_shards)
    left = lax.rem(s + n_shards - 1, n_shards)
    # Neighbor barrier: don't write into a peer before it reaches this
    # exchange (the guide's standard local-barrier pattern; with S == 2 the
    # two signals land on the same peer, which then waits for both).
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id={axis_name: left})
    pltpu.semaphore_signal(barrier, inc=1, device_id={axis_name: right})
    pltpu.semaphore_wait(barrier, 2)
    up = pltpu.make_async_remote_copy(
        src_ref=top_ref,
        dst_ref=below_ref,
        send_sem=send_up,
        recv_sem=recv_up,
        device_id={axis_name: right},
    )
    dn = pltpu.make_async_remote_copy(
        src_ref=bot_ref,
        dst_ref=above_ref,
        send_sem=send_dn,
        recv_sem=recv_dn,
        device_id={axis_name: left},
    )
    up.start()
    dn.start()
    up.wait()
    dn.wait()


def band_exchange_rdma(
    x,
    width: int,
    *,
    axis_name: str = SPATIAL_AXIS,
    n_shards: int,
    interpret: bool = False,
):
    """``(below, above)`` ghost row bands of a row-band-sharded field.

    Drop-in equivalent of the two nearest-neighbor ``ppermute`` s in
    :func:`dlwp_cs_tpu.parallel.halo.halo_pieces`: ``below`` is the +1-ring
    image of my top ``width`` rows arriving from my -1 neighbor, ``above``
    the mirror.  ``interpret=True`` runs the TPU interpreter (CPU-mesh
    equivalence tests).
    """
    b, nf, h, n, c = x.shape
    w = int(width)
    top = x[:, :, h - w :]
    bot = x[:, :, :w]
    if n_shards == 1:
        return top, bot
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, axis_name=axis_name, n_shards=n_shards)
    below, above = pl.pallas_call(
        kern,
        in_specs=[vmem, vmem],
        out_specs=(vmem, vmem),
        out_shape=(jax.ShapeDtypeStruct(top.shape, x.dtype),) * 2,
        scratch_shapes=[pltpu.SemaphoreType.DMA(())] * 4,
        compiler_params=pltpu.CompilerParams(collective_id=_COLLECTIVE_ID),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(top, bot)
    return below, above
