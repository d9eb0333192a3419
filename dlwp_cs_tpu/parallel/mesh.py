"""Device meshes and canonical shardings.

The reference has no distributed runtime at all (its only parallelism is an
optional single-host Keras multi-GPU mirror — SURVEY.md §2 row 12, §2b).
This module defines the TPU-native scaling surface instead: a 2-D logical
mesh ``('data', 'spatial')`` where

* ``data`` carries batch data-parallelism (gradient psum over ICI), and
* ``spatial`` carries domain decomposition of the cubed-sphere grid — faces'
  row (eta) bands are sharded, with halo exchange provided by
  :mod:`dlwp_cs_tpu.parallel.halo` (the stencil analog of sequence/context
  parallelism, SURVEY.md §5.7).

Multi-host: the same mesh spans hosts via ``jax.distributed.initialize``;
axis order puts ``spatial`` innermost so halo neighbors land on adjacent
chips (ICI) and gradient reduction crosses the slower links less often.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_sharding",
    "batch_spatial_sharding",
    "stacked_batch_sharding",
    "replicated",
    "DATA_AXIS",
    "SPATIAL_AXIS",
]

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def create_mesh(
    data: int | None = None, spatial: int = 1, *, devices=None
) -> Mesh:
    """Create the canonical ``('data', 'spatial')`` mesh.

    ``data=None`` uses all remaining devices.  ``spatial`` must divide the
    face size being sharded (checked when a halo plan is built).
    """
    devices = jax.devices() if devices is None else list(devices)
    n = len(devices)
    if data is None:
        if n % spatial:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        data = n // spatial
    if data * spatial > n:
        raise ValueError(f"mesh {data}x{spatial} needs {data * spatial} devices, have {n}")
    grid = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    """Shard the leading batch axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def batch_spatial_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    """Shard batch over 'data' and the face-row axis over 'spatial'.

    Canonical activation layout ``(B, 6, H, W, C)``: axis 2 (H / eta rows)
    carries the domain decomposition.
    """
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if ndim >= 3:
        spec[2] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def stacked_batch_sharding(mesh: Mesh, ndim: int = 6) -> NamedSharding:
    """Like :func:`batch_sharding` for k-stacked batches ``(k, B, ...)``:
    the leading (step) axis is replicated, axis 1 is sharded over 'data'."""
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
