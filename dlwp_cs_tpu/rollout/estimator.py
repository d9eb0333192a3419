"""Autoregressive forecasting as one on-device ``lax.scan``.

Capability parity with the reference's
``DLWP/model/extensions.py::TimeSeriesEstimator`` (SURVEY.md §2 row 11,
§3.3): feed the model's multi-step outputs back as the next inputs, recompute
the insolation forcing channels at each new valid time, and hold constant
fields fixed.

TPU-first redesign: the reference drives this loop from the host — one
``model.predict`` device round-trip *per step* plus host-side numpy
insolation.  Here the entire 56-step (14-day) rollout compiles to a single
``lax.scan``: state (the sliding input window and the clock) never leaves the
device, insolation is computed in-graph (:mod:`dlwp_cs_tpu.geometry
.insolation`), and the whole forecast is one XLA executable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.data.channels import (
    advance_window,
    make_input_insolation,
    pack_inputs,
)
from dlwp_cs_tpu.geometry.insolation import INSOLATION_PERIOD_DAYS
from dlwp_cs_tpu.models.config import DataConfig

__all__ = ["Forecast", "TimeSeriesEstimator", "make_rollout_fn"]


class Forecast(NamedTuple):
    """Rollout result (the reference returns a labeled DataArray with
    ``f_hour``/coords — ``DLWP/model/extensions.py``; this carries the same
    metadata without an xarray dependency).

    ``fields``: ``(B, steps * T_out, 6, n, n, C_var)`` normalized prognostic
    forecasts, time ordered.
    ``lead_hours``: ``(steps * T_out,)`` forecast lead times in hours.
    ``init_times``: optional ``(B,)`` initialization times (days since
    2000-01-01) — the rollout's ``t0_days`` input.
    ``variables``: optional channel names, length C_var.
    """

    fields: jnp.ndarray
    lead_hours: jnp.ndarray
    init_times: Any = None
    variables: tuple[str, ...] | None = None

    def valid_times(self):
        """``(B, steps * T_out)`` valid times in days since 2000-01-01."""
        if self.init_times is None:
            raise ValueError("Forecast carries no init_times")
        import numpy as np

        t0 = np.atleast_1d(np.asarray(self.init_times, np.float64))
        return t0[:, None] + np.asarray(self.lead_hours, np.float64)[None, :] / 24.0


def make_rollout_fn(
    apply_fn,
    data_cfg: DataConfig,
    *,
    lat,
    lon,
    constants=None,
    insol_mean: float = 0.0,
    insol_std: float = 1.0,
    steps: int,
    unroll: int = 1,
):
    """Build a jittable ``rollout(params, window, t0_days) -> Forecast``.

    Args:
      apply_fn: ``apply_fn(params, inputs) -> outputs`` (the model).
      data_cfg: channel/time-step configuration.
      lat, lon: ``(6, n, n)`` cell-center coordinates in radians.
      constants: optional ``(6, n, n, K)`` normalized static channels.
      insol_mean / insol_std: normalization stats for the insolation channel
        (from the training pipeline).
      steps: number of autoregressive model calls.
      unroll: lax.scan unroll factor (TPU pipelining knob).

    The initial ``window`` is ``(B, T_in, 6, n, n, C_var)`` holding fields at
    valid times ``t0 - (T_in-1)*dt .. t0`` (normalized), matching the
    training-time input window semantics.
    """
    t_in = data_cfg.input_time_steps
    t_out = data_cfg.output_time_steps
    dt_days = data_cfg.step_hours / 24.0
    lat = jnp.asarray(lat)
    lon = jnp.asarray(lon)
    if constants is not None:
        constants = jnp.asarray(constants)

    # the SAME forcing-clock and window-rewiring definitions as the
    # autoregressive training loss (data/channels.py) — train/inference
    # consistency is structural, not by parallel maintenance
    input_insolation = make_input_insolation(
        data_cfg, lat, lon, insol_mean, insol_std
    )

    def rollout(params, window, t0_days) -> Forecast:
        if window.ndim != 6 or window.shape[1] != t_in:
            raise ValueError(
                f"window must be (B, {t_in}, 6, n, n, C), got {window.shape}"
            )
        t0_days = jnp.asarray(t0_days, jnp.float32)
        if t0_days.ndim not in (0, 1) or (
            t0_days.ndim == 1 and t0_days.shape[0] != window.shape[0]
        ):
            raise ValueError(
                "t0_days must be a scalar or a (B,) vector matching the "
                f"window batch {window.shape[0]}, got shape {t0_days.shape}"
            )
        # The scan clock exists only to drive insolation, which is periodic
        # in 1461 days: reduce so the float32 clock accumulates at ~10 s
        # resolution instead of the ~84 s ULP of raw present-day epoch days
        # (callers that pre-reduce in float64 — predict/forecast do — keep
        # full precision through the cast).
        t0_days = jnp.mod(t0_days, INSOLATION_PERIOD_DAYS)

        def scan_step(carry, _):
            window, t_days = carry
            inputs = pack_inputs(window, input_insolation(t_days), constants)
            out = apply_fn(params, inputs)
            new_window, out_window = advance_window(window, out, t_out)
            return (new_window, t_days + t_out * dt_days), out_window

        (_, _), outs = lax.scan(
            scan_step, (window, t0_days), None, length=steps, unroll=unroll
        )
        # outs: (steps, B, T_out, 6, n, n, C) -> (B, steps*T_out, ...)
        outs = jnp.moveaxis(outs, 1, 0)
        fields = outs.reshape(
            (outs.shape[0], steps * t_out) + outs.shape[3:]
        )
        lead = (jnp.arange(steps * t_out) + 1) * data_cfg.step_hours
        return Forecast(fields=fields, lead_hours=lead)

    return rollout


@dataclass
class TimeSeriesEstimator:
    """Object-style wrapper mirroring the reference's estimator API.

    ``TimeSeriesEstimator(model, params, data_cfg, lat=..., lon=...,
    constants=..., ...).predict(window, t0_days, steps=56)``.
    """

    apply_fn: Any
    params: Any
    data_cfg: DataConfig
    lat: Any
    lon: Any
    constants: Any = None
    insol_mean: float = 0.0
    insol_std: float = 1.0

    def predict(
        self,
        window,
        t0_days,
        *,
        steps: int,
        jit: bool = True,
        unroll: int = 1,
    ) -> Forecast:
        # cache the jitted rollout per (steps, unroll, jit): a fresh
        # closure + jax.jit per call would recompile the steps-long scan
        # every predict (jit caches by function identity)
        cache = self.__dict__.setdefault("_rollout_cache", {})
        key = (steps, unroll, jit)
        fn = cache.get(key)
        if fn is None:
            fn = make_rollout_fn(
                self.apply_fn,
                self.data_cfg,
                lat=self.lat,
                lon=self.lon,
                constants=self.constants,
                insol_mean=self.insol_mean,
                insol_std=self.insol_std,
                steps=steps,
                unroll=unroll,
            )
            if jit:
                fn = jax.jit(fn)
            cache[key] = fn
        # float64 host-side periodic reduction BEFORE the f32 cast inside
        # the rollout (see make_rollout_fn); keep the original init times
        # on the Forecast.
        import numpy as np

        t0_red = np.mod(
            np.asarray(t0_days, np.float64), INSOLATION_PERIOD_DAYS
        ).astype(np.float32)
        fc = fn(self.params, window, t0_red if t0_red.ndim else float(t0_red))
        return fc._replace(
            init_times=t0_days, variables=tuple(self.data_cfg.variables)
        )
