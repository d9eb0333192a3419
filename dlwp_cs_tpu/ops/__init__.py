"""Cubed-sphere ops: halo padding, convolution, pooling, losses."""

from dlwp_cs_tpu.ops.conv import conv_halo_width, cs_conv
from dlwp_cs_tpu.ops.latlon import latlon_conv, periodic_pad
from dlwp_cs_tpu.ops.losses import (
    AreaWeightedLoss,
    anomaly_correlation,
    latitude_weighted_loss,
    latitude_weights,
    mae,
    mse,
    weighted_mae,
    weighted_mse,
)
from dlwp_cs_tpu.ops.padding import PaddingPlan, cs_pad, padding_plan
from dlwp_cs_tpu.ops.pooling import cs_avg_pool, cs_max_pool, cs_upsample

__all__ = [
    "AreaWeightedLoss",
    "conv_halo_width",
    "cs_conv",
    "latlon_conv",
    "periodic_pad",
    "anomaly_correlation",
    "latitude_weighted_loss",
    "latitude_weights",
    "mae",
    "mse",
    "weighted_mae",
    "weighted_mse",
    "PaddingPlan",
    "cs_pad",
    "padding_plan",
    "cs_avg_pool",
    "cs_max_pool",
    "cs_upsample",
]
