"""Distributed execution: meshes, shardings, halo exchange, sharded steps."""

from dlwp_cs_tpu.parallel.halo import make_sharded_pad, sharded_cs_pad
from dlwp_cs_tpu.parallel.halo2d import make_sharded_pad_2d, sharded_cs_pad_2d
from dlwp_cs_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    SPATIAL_X_AXIS,
    batch_sharding,
    batch_spatial_sharding,
    create_mesh,
    replicated,
)
from dlwp_cs_tpu.parallel.multihost import (
    global_mesh,
    host_batch_slice,
    initialize_distributed,
)
from dlwp_cs_tpu.parallel.scaling import ScalingResult, measure_scaling
from dlwp_cs_tpu.parallel.sharding import (
    make_dp_eval_step,
    make_dp_shardmap_train_step,
    make_dp_train_step,
    make_spatial_apply,
    make_spatial_train_step,
    shard_batch,
)

__all__ = [
    "make_sharded_pad",
    "sharded_cs_pad",
    "make_sharded_pad_2d",
    "sharded_cs_pad_2d",
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "SPATIAL_X_AXIS",
    "batch_sharding",
    "batch_spatial_sharding",
    "create_mesh",
    "replicated",
    "global_mesh",
    "host_batch_slice",
    "initialize_distributed",
    "ScalingResult",
    "measure_scaling",
    "make_dp_eval_step",
    "make_dp_shardmap_train_step",
    "make_dp_train_step",
    "make_spatial_apply",
    "make_spatial_train_step",
    "shard_batch",
]
