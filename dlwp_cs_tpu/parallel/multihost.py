"""Multi-host bring-up helpers.

SURVEY.md §5.8 / §7 M6: the reference has no multi-host story; here the same
``('data', 'spatial')`` mesh spans hosts — ICI carries halo ppermutes and
gradient psums inside a slice, DCN only feeds per-host input shards and
checkpoints.  This module wraps the standard JAX bring-up so launch scripts
stay one-liners.

Single-host (or this environment's single chip) is the degenerate case: all
helpers are no-ops/identities, so the same entry point runs everywhere.
"""

from __future__ import annotations

import jax
import numpy as np

from dlwp_cs_tpu.parallel.mesh import create_mesh

__all__ = ["initialize_distributed", "global_mesh", "host_batch_slice"]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed if running multi-process; returns True if so.

    With no arguments, relies on the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS etc.); safe to call unconditionally — a
    single-process run simply skips initialization.

    MUST run before anything touches the XLA backend — including
    ``jax.process_count()``/``jax.devices()`` in THIS function (calling them
    first initializes the backend and makes ``jax.distributed.initialize``
    raise, which an earlier version swallowed, silently degrading a pod to N
    isolated single-host runs).  Only the already-initialized RuntimeError is
    treated as benign.
    """
    def _try_init(**kwargs) -> bool:
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            if "already initialized" in str(e).lower():
                return True  # idempotent re-entry
            raise
        except ValueError:
            # no coordinator/environment configured: a plain single-process
            # run (the no-args autodetect path only)
            if kwargs:
                raise
            return False
        return True

    if coordinator_address is None and num_processes is None:
        if not _try_init():
            return False
        return jax.process_count() > 1
    _try_init(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(spatial: int = 1):
    """Mesh over ALL devices (all hosts); data axis absorbs the rest.

    Axis order keeps ``spatial`` innermost so halo neighbors are
    ICI-adjacent.
    """
    return create_mesh(data=None, spatial=spatial)


def host_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of the global batch (per-host feeding).

    Each host builds only its shard of every batch; combined with
    ``jax.make_array_from_process_local_data`` or the prefetcher's sharding,
    the global array forms without any host holding the full batch.
    """
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n_proc} hosts"
        )
    per = global_batch // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)
