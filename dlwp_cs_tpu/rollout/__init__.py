"""Autoregressive rollout: on-device lax.scan forecasting."""

from dlwp_cs_tpu.rollout.estimator import Forecast, TimeSeriesEstimator, make_rollout_fn

__all__ = ["Forecast", "TimeSeriesEstimator", "make_rollout_fn"]
