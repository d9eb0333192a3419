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
    "SPATIAL_X_AXIS",
]

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"  # face-row (eta) decomposition
SPATIAL_X_AXIS = "spatial_x"  # face-column (xi) decomposition (2-D tiling)


def create_mesh(
    data: int | None = None, spatial: int = 1, spatial_x: int = 1, *, devices=None
) -> Mesh:
    """Create the canonical ``('data', 'spatial'[, 'spatial_x'])`` mesh.

    ``data=None`` uses all remaining devices.  ``spatial`` (face rows) and
    ``spatial_x`` (face columns) must divide the face size being sharded
    (checked when a halo plan is built).  A third mesh axis is only created
    when ``spatial_x > 1``, so 1-D paths see the familiar 2-axis mesh.
    """
    devices = jax.devices() if devices is None else list(devices)
    n = len(devices)
    sp = spatial * spatial_x
    if data is None:
        if n % sp:
            raise ValueError(f"{n} devices not divisible by spatial={sp}")
        data = n // sp
    if data * sp > n:
        raise ValueError(f"mesh {data}x{sp} needs {data * sp} devices, have {n}")
    if spatial_x > 1:
        grid = np.asarray(devices[: data * sp]).reshape(data, spatial, spatial_x)
        return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS, SPATIAL_X_AXIS))
    grid = np.asarray(devices[: data * sp]).reshape(data, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    """Shard the leading batch axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def batch_spatial_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    """Shard batch over 'data' and the face-row axis over 'spatial'
    (plus face columns over 'spatial_x' when the mesh carries that axis).

    Canonical activation layout ``(B, 6, H, W, C)``: axis 2 (H / eta rows)
    and axis 3 (W / xi columns) carry the domain decomposition.
    """
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if ndim >= 3:
        spec[2] = SPATIAL_AXIS
    if ndim >= 4 and SPATIAL_X_AXIS in mesh.shape:
        spec[3] = SPATIAL_X_AXIS
    return NamedSharding(mesh, P(*spec))


def stacked_batch_sharding(mesh: Mesh, ndim: int = 6) -> NamedSharding:
    """Like :func:`batch_sharding` for k-stacked batches ``(k, B, ...)``:
    the leading (step) axis is replicated, axis 1 is sharded over 'data'."""
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
