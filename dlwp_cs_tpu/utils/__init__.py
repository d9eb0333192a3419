"""Utilities: checkpointing, json IO."""

from dlwp_cs_tpu.utils.profiling import Timer, conv_roofline, trace
from dlwp_cs_tpu.utils.checkpoint import (
    latest_step,
    load_json,
    restore_checkpoint,
    save_checkpoint,
    save_json,
)

__all__ = [
    "Timer",
    "conv_roofline",
    "trace",
    "latest_step",
    "load_json",
    "restore_checkpoint",
    "save_checkpoint",
    "save_json",
]
