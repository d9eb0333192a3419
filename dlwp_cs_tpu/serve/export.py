"""AOT-exported serving artifacts (StableHLO via ``jax.export``).

The reference's only deployment format is a pickle of the Python wrapper +
Keras weights (``DLWP/util.py::save_model``, SURVEY.md §3.4), which requires
the full framework — and the exact class layout — at load time.  This module
is the TPU-native counterpart for production: the whole compiled rollout
(model weights baked in as constants, insolation in-graph, the 56-step scan)
serializes to a **versioned StableHLO artifact** that any process with jax
installed can load and run — no model code, no param pytrees, no recompile
risk from library drift.  ``jax.export``'s serialization calling convention
is stable across jax releases, so the artifact outlives the framework
version that produced it.

Artifact layout (a directory)::

    meta.json          steps, batch sizes, window shape, variables, stats
    stats.npz          per-variable mean/std (raw-units contract)
    rollout_b{N}.bin   one exported executable per batch bucket

``export_forecaster`` writes it from a fitted/loaded estimator;
``ExportedForecaster.load`` serves from it with the same raw-units contract
as :class:`dlwp_cs_tpu.serve.ForecastService` (requests bucket to the next
exported batch size, padding members discarded).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from dlwp_cs_tpu.geometry.insolation import INSOLATION_PERIOD_DAYS
from dlwp_cs_tpu.rollout.estimator import Forecast, make_rollout_fn
from dlwp_cs_tpu.serve.service import MicroBatcher

__all__ = [
    "ExportedForecastService",
    "ExportedForecaster",
    "export_forecaster",
]

_FORMAT = 1


def export_forecaster(
    estimator,
    path,
    *,
    steps: int,
    batch_sizes=(1,),
    constants=None,
    constants_store=None,
    platforms=None,
) -> Path:
    """Export the fitted estimator's rollout as a standalone artifact.

    Args:
      estimator: a fitted/loaded :class:`~dlwp_cs_tpu.estimator
        .DLWPEstimator`.
      path: artifact directory (created/overwritten).
      steps: autoregressive model calls per forecast (56 = 14 days at the
        default 2x6h per call).
      batch_sizes: window batch sizes to export — shapes are static in
        StableHLO, so each becomes one executable (power-of-two buckets
        mirror the service's micro-batcher).
      constants / constants_store: static channels, as for
        :class:`~dlwp_cs_tpu.serve.ForecastService` (baked into the
        artifact).
      platforms: lowering platforms, e.g. ``("tpu", "cpu")`` for an
        artifact that runs on both; default: the current backend only.
        Note: exporting from a non-TPU process lowers the portable XLA
        conv path (Pallas kernels are a TPU-trace-time dispatch), which
        runs anywhere but leaves some single-chip speed behind.

    Exported signature per bucket: ``(window_norm (B, T_in, 6, n, n, C)
    f32, t0_days (B,) f32 pre-reduced mod 1461)`` -> normalized fields.
    """
    if estimator.state is None or estimator.stats is None:
        raise RuntimeError("estimator has no state: fit or load it first")
    dcfg = estimator.config.data
    if constants is None and constants_store is not None:
        from dlwp_cs_tpu.data.store import select_constants

        constants = select_constants(constants_store, dcfg.constants)
    if len(dcfg.constants) and constants is None:
        raise ValueError(
            f"model uses constant channels {dcfg.constants} — pass "
            "constants= or constants_store="
        )
    lat, lon = estimator.cs.cell_latlon
    stats = estimator.stats
    params = estimator.state.params
    rollout = make_rollout_fn(
        estimator.model.apply,
        dcfg,
        lat=lat,
        lon=lon,
        constants=None if constants is None else jnp.asarray(constants),
        insol_mean=stats["insol_mean"],
        insol_std=stats["insol_std"],
        steps=steps,
    )

    def fields_fn(window, t0):
        # params baked in as constants; Forecast metadata is re-derived at
        # load time (meta.json), only the array output crosses the boundary
        return rollout(params, window, t0).fields

    n = dcfg.grid_n
    t_in = dcfg.input_time_steps
    c_var = dcfg.n_variables
    target = Path(path)
    target.mkdir(parents=True, exist_ok=True)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    exported_platforms = None
    for b in batch_sizes:
        spec_w = jax.ShapeDtypeStruct((b, t_in, 6, n, n, c_var), jnp.float32)
        spec_t = jax.ShapeDtypeStruct((b,), jnp.float32)
        exp = jax_export.export(jax.jit(fields_fn), **kwargs)(spec_w, spec_t)
        exported_platforms = list(exp.platforms)
        (target / f"rollout_b{b}.bin").write_bytes(exp.serialize())
    lead_hours = (np.arange(steps * dcfg.output_time_steps) + 1) * dcfg.step_hours
    meta = {
        "format": _FORMAT,
        "steps": int(steps),
        "batch_sizes": batch_sizes,
        "window_shape": [t_in, 6, n, n, c_var],
        "variables": list(dcfg.variables),
        "lead_hours": lead_hours.tolist(),
        "platforms": exported_platforms,
        # temporal contract: consumers must sample the input window at this
        # spacing — record it so clients can validate instead of guessing
        "step_hours": dcfg.step_hours,
        "output_time_steps": dcfg.output_time_steps,
    }
    (target / "meta.json").write_text(json.dumps(meta, indent=1))
    np.savez(
        target / "stats.npz",
        mean=np.asarray(stats["mean"], np.float32),
        std=np.asarray(stats["std"], np.float32),
    )
    return target


class ExportedForecaster:
    """Serve forecasts from an :func:`export_forecaster` artifact.

    Needs only jax + numpy (no model classes, no checkpoint): the
    executables deserialize with ``jax.export.deserialize`` and run under
    ``jax.jit``.  Same raw-units contract as ``ForecastService.forecast``.
    """

    def __init__(self, path):
        target = Path(path)
        self.meta = json.loads((target / "meta.json").read_text())
        if self.meta.get("format") != _FORMAT:
            raise ValueError(
                f"unsupported artifact format {self.meta.get('format')!r}"
            )
        with np.load(target / "stats.npz") as f:
            self._mean = f["mean"].astype(np.float32)
            self._std = f["std"].astype(np.float32)
        self._fns = {}
        for b in self.meta["batch_sizes"]:
            exp = jax_export.deserialize(
                (target / f"rollout_b{b}.bin").read_bytes()
            )
            self._fns[int(b)] = jax.jit(exp.call)
        self.batch_sizes = sorted(self._fns)
        self.variables = tuple(self.meta["variables"])

    @classmethod
    def load(cls, path) -> "ExportedForecaster":
        return cls(path)

    def _check_window(self, window) -> np.ndarray:
        want = tuple(self.meta["window_shape"])
        window = np.asarray(window, np.float32)
        if window.shape == want:
            window = window[None]
        elif window.ndim != 6 or window.shape[1:] != want:
            raise ValueError(
                f"window must be {want} or (B,) + that shape, got "
                f"{window.shape}"
            )
        return window

    def forecast(self, window, t0_days, *, normalized: bool = False) -> Forecast:
        """Forecast one window batch (steps fixed at export time).

        ``window``: raw ``(T_in, 6, n, n, C_var)`` or ``(B,) + that``;
        ``t0_days``: scalar / ``(B,)`` init times (days since 2000-01-01).
        The batch buckets up to the next exported size (error if above the
        largest); padding members are discarded.
        """
        window = self._check_window(window)
        b = window.shape[0]
        bucket = next((s for s in self.batch_sizes if s >= b), None)
        if bucket is None:
            raise ValueError(
                f"batch {b} exceeds the largest exported size "
                f"{self.batch_sizes[-1]}"
            )
        t0 = np.atleast_1d(np.asarray(t0_days, np.float64))
        if t0.shape[0] == 1 and b > 1:
            t0 = np.repeat(t0, b)
        if t0.shape[0] != b:
            raise ValueError(
                f"t0_days batch {t0.shape[0]} != window batch {b}"
            )
        if not normalized:
            window = (window - self._mean) / self._std
        pad = bucket - b
        if pad:
            window = np.concatenate(
                [window, np.repeat(window[-1:], pad, axis=0)], axis=0
            )
            t0 = np.concatenate([t0, np.repeat(t0[-1:], pad)])
        # float64 periodic reduction before the f32 cast (insolation clock
        # precision — rollout/estimator.py)
        t0_red = np.mod(t0, INSOLATION_PERIOD_DAYS).astype(np.float32)
        fields = np.asarray(self._fns[bucket](window, t0_red))[:b]
        if not normalized:
            fields = fields * self._std + self._mean
        return Forecast(
            fields=fields,
            lead_hours=np.asarray(self.meta["lead_hours"]),
            init_times=t0[:b],
            variables=self.variables,
        )


class ExportedForecastService(MicroBatcher):
    """Serve an AOT artifact behind the micro-batching HTTP front end.

    The full deployment story without model code: a box with jax + numpy +
    this module serves ``/forecast`` from an :func:`export_forecaster`
    directory — ``ForecastHTTPServer(ExportedForecastService(path))``.
    ``steps`` is fixed by the artifact; requests with any other value are
    rejected (the HTTP layer surfaces that as a 400).  ``/ensemble`` is not
    available on artifact backends (the perturbation machinery needs the
    live model); the front end replies 400 for it.
    """

    def __init__(self, artifact, *, max_batch: int | None = None,
                 max_wait_ms: float = 5.0):
        exp = (artifact if isinstance(artifact, ExportedForecaster)
               else ExportedForecaster.load(artifact))
        self._exp = exp
        self.steps = int(exp.meta["steps"])
        self.quantized = False
        cap = max(exp.batch_sizes)
        self._init_batcher(
            cap if max_batch is None else min(int(max_batch), cap),
            max_wait_ms,
        )

    def _check_window(self, window):
        return self._exp._check_window(window)

    def forecast(self, window, t0_days, *, steps: int,
                 normalized: bool = False) -> Forecast:
        if int(steps) != self.steps:
            raise ValueError(
                f"this artifact was exported with steps={self.steps}; "
                f"got steps={steps}"
            )
        t0_wall = time.perf_counter()
        fc = self._exp.forecast(window, t0_days, normalized=normalized)
        with self._lock:
            self.stats.device_seconds += time.perf_counter() - t0_wall
        return fc

    def info(self) -> dict:
        meta = self._exp.meta
        t_in, _, n, _, c_var = meta["window_shape"]
        return {
            "grid_n": n,
            "variables": list(meta["variables"]),
            "input_time_steps": t_in,
            "steps": meta["steps"],
            "batch_sizes": meta["batch_sizes"],
            "platforms": meta["platforms"],
            # present on older artifacts as None rather than KeyError
            "step_hours": meta.get("step_hours"),
            "output_time_steps": meta.get("output_time_steps"),
            "backend": "aot-artifact",
            "quantized": False,
        }
