"""Forecast verification metrics."""

from dlwp_cs_tpu.verify.alignment import align_truth
from dlwp_cs_tpu.verify.metrics import (
    acc_curve,
    climo_error,
    forecast_error,
    monthly_climo_error,
    persistence_error,
)

__all__ = [
    "align_truth",
    "acc_curve",
    "climo_error",
    "forecast_error",
    "monthly_climo_error",
    "persistence_error",
]
