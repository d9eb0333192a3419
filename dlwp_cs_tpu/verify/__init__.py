"""Forecast verification metrics."""

from dlwp_cs_tpu.verify.metrics import (
    acc_curve,
    climo_error,
    forecast_error,
    monthly_climo_error,
    persistence_error,
)

__all__ = [
    "acc_curve",
    "climo_error",
    "forecast_error",
    "monthly_climo_error",
    "persistence_error",
]
