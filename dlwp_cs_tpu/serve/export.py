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

    meta.json               steps values, batch sizes, window shape, stats
    stats.npz               per-variable mean/std (raw-units contract)
    rollout_s{S}_b{N}.bin   one exported executable per (steps, batch bucket)

``export_forecaster`` writes it from a fitted/loaded estimator (several
``steps`` values may share one artifact — a 4-day and a 14-day product from
the same deployment dir); ``ExportedForecaster.load`` serves from it with
the same raw-units contract as :class:`dlwp_cs_tpu.serve.ForecastService`
(requests bucket to the next exported batch size, padding members
discarded).  ``tools/export_artifact.py`` re-exports an artifact from any
existing checkpoint directory.  Format 1 artifacts (single ``steps``,
``rollout_b{N}.bin``) load unchanged.
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

_FORMAT = 2


def export_forecaster(
    estimator,
    path,
    *,
    steps,
    batch_sizes=(1,),
    constants=None,
    constants_store=None,
    platforms=None,
) -> Path:
    """Export the fitted estimator's rollout as a standalone artifact.

    Args:
      estimator: a fitted/loaded :class:`~dlwp_cs_tpu.estimator
        .DLWPEstimator`.
      path: artifact directory (created/overwritten; stale ``rollout_*.bin``
        executables from a previous export are removed first).
      steps: autoregressive model calls per forecast (56 = 14 days at the
        default 2x6h per call) — an int or an iterable of ints; each value
        becomes its own set of executables in the one artifact, selected
        per request at serve time.
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
    steps_values = sorted(
        {int(steps)} if np.isscalar(steps) else {int(s) for s in steps}
    )
    n = dcfg.grid_n
    t_in = dcfg.input_time_steps
    c_var = dcfg.n_variables
    if not steps_values:
        raise ValueError("steps must name at least one rollout length")
    target = Path(path)
    target.mkdir(parents=True, exist_ok=True)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes:
        raise ValueError("batch_sizes must name at least one bucket")
    exported_platforms = None
    # Stage every executable under a tmp name first; the pre-existing
    # artifact (old rollout_*.bin + meta.json) is only replaced after ALL
    # exports succeed, so a mid-export failure over a live artifact dir
    # cannot leave meta.json referencing deleted executables.
    staged: dict[str, Path] = {}
    for s in steps_values:
        rollout = make_rollout_fn(
            estimator.model.apply,
            dcfg,
            lat=lat,
            lon=lon,
            constants=None if constants is None else jnp.asarray(constants),
            insol_mean=stats["insol_mean"],
            insol_std=stats["insol_std"],
            steps=s,
        )

        def fields_fn(window, t0, rollout=rollout):
            # params baked in as constants; Forecast metadata is re-derived
            # at load time (meta.json), only the array output crosses the
            # boundary
            return rollout(params, window, t0).fields

        for b in batch_sizes:
            spec_w = jax.ShapeDtypeStruct(
                (b, t_in, 6, n, n, c_var), jnp.float32
            )
            spec_t = jax.ShapeDtypeStruct((b,), jnp.float32)
            try:
                exp = jax_export.export(jax.jit(fields_fn), **kwargs)(
                    spec_w, spec_t
                )
                exported_platforms = list(exp.platforms)
                tmp = target / f".rollout_s{s}_b{b}.bin.tmp"
                tmp.write_bytes(exp.serialize())
            except BaseException:
                for t in staged.values():
                    t.unlink(missing_ok=True)
                raise
            staged[f"rollout_s{s}_b{b}.bin"] = tmp
    # every export succeeded — now retire stale executables from a previous
    # export (ADVICE r4: leftovers with an older steps/config would linger
    # unused but confusing) and publish the new set
    for old in target.glob("rollout_*.bin"):
        old.unlink()
    for name, tmp in staged.items():
        tmp.replace(target / name)
    meta = {
        "format": _FORMAT,
        # primary value kept as an int for older consumers; the full set
        # lives in steps_values
        "steps": steps_values[-1],
        "steps_values": steps_values,
        "batch_sizes": batch_sizes,
        "window_shape": [t_in, 6, n, n, c_var],
        "variables": list(dcfg.variables),
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
        fmt = self.meta.get("format")
        if fmt not in (1, _FORMAT):
            raise ValueError(f"unsupported artifact format {fmt!r}")
        with np.load(target / "stats.npz") as f:
            self._mean = f["mean"].astype(np.float32)
            self._std = f["std"].astype(np.float32)
        if fmt == 1:
            self.steps_values = [int(self.meta["steps"])]
            name = lambda s, b: f"rollout_b{b}.bin"  # noqa: E731
        else:
            self.steps_values = [int(s) for s in self.meta["steps_values"]]
            name = lambda s, b: f"rollout_s{s}_b{b}.bin"  # noqa: E731
        self._fns = {}
        for s in self.steps_values:
            for b in self.meta["batch_sizes"]:
                exp = jax_export.deserialize(
                    (target / name(s, b)).read_bytes()
                )
                self._fns[(s, int(b))] = jax.jit(exp.call)
        self.batch_sizes = sorted({b for _, b in self._fns})
        self.variables = tuple(self.meta["variables"])

    @classmethod
    def load(cls, path) -> "ExportedForecaster":
        return cls(path)

    def _lead_hours(self, steps: int) -> np.ndarray:
        if self.meta.get("format") == 1:
            return np.asarray(self.meta["lead_hours"])
        t_out = int(self.meta["output_time_steps"])
        return (np.arange(steps * t_out) + 1.0) * self.meta["step_hours"]

    def _resolve_steps(self, steps) -> int:
        if steps is None:
            if len(self.steps_values) > 1:
                raise ValueError(
                    f"artifact exports steps={self.steps_values}; pass "
                    "steps= explicitly"
                )
            return self.steps_values[0]
        if int(steps) not in self.steps_values:
            raise ValueError(
                f"this artifact was exported with steps={self.steps_values}; "
                f"got steps={int(steps)}"
            )
        return int(steps)

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

    def forecast(self, window, t0_days, *, steps=None,
                 normalized: bool = False) -> Forecast:
        """Forecast one window batch.

        ``window``: raw ``(T_in, 6, n, n, C_var)`` or ``(B,) + that``;
        ``t0_days``: scalar / ``(B,)`` init times (days since 2000-01-01);
        ``steps``: one of the artifact's exported values (optional when it
        exports exactly one).  The batch buckets up to the next exported
        size (error if above the largest); padding members are discarded.
        """
        steps = self._resolve_steps(steps)
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
        fields = np.asarray(self._fns[(steps, bucket)](window, t0_red))[:b]
        if not normalized:
            fields = fields * self._std + self._mean
        return Forecast(
            fields=fields,
            lead_hours=self._lead_hours(steps),
            init_times=t0[:b],
            variables=self.variables,
        )


class ExportedForecastService(MicroBatcher):
    """Serve an AOT artifact behind the micro-batching HTTP front end.

    The full deployment story without model code: a box with jax + numpy +
    this module serves ``/forecast`` from an :func:`export_forecaster`
    directory — ``ForecastHTTPServer(ExportedForecastService(path))``.
    ``steps`` must be one of the artifact's exported values; requests with
    any other value are rejected (the HTTP layer surfaces that as a 400).
    ``/ensemble`` is not available on artifact backends (the perturbation
    machinery needs the live model); the front end replies 400 for it.
    """

    def __init__(self, artifact, *, max_batch: int | None = None,
                 max_wait_ms: float = 5.0, max_queue: int = 64,
                 request_timeout_s: float | None = 120.0):
        exp = (artifact if isinstance(artifact, ExportedForecaster)
               else ExportedForecaster.load(artifact))
        self._exp = exp
        self.steps = int(exp.meta["steps"])
        self.steps_values = list(exp.steps_values)
        self.quantized = False
        cap = max(exp.batch_sizes)
        self._init_batcher(
            cap if max_batch is None else min(int(max_batch), cap),
            max_wait_ms, max_queue=max_queue,
            request_timeout_s=request_timeout_s,
        )

    def _check_window(self, window):
        return self._exp._check_window(window)

    def _validate_request(self, steps: int, members: int | None = None):
        self._exp._resolve_steps(steps)  # submit-time rejection

    def forecast(self, window, t0_days, *, steps: int,
                 normalized: bool = False) -> Forecast:
        fc = self._forecast_batch(window, t0_days, steps=steps,
                                  normalized=normalized)
        with self._lock:
            self.stats.requests += fc.fields.shape[0]
            self.stats.batches += 1
        return fc

    def _forecast_batch(self, window, t0_days, *, steps: int,
                        normalized: bool = False) -> Forecast:
        t0_wall = time.perf_counter()
        fc = self._exp.forecast(window, t0_days, steps=steps,
                                normalized=normalized)
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
            "steps_values": self.steps_values,
            "batch_sizes": meta["batch_sizes"],
            "platforms": meta["platforms"],
            # present on older artifacts as None rather than KeyError
            "step_hours": meta.get("step_hours"),
            "output_time_steps": meta.get("output_time_steps"),
            "backend": "aot-artifact",
            "quantized": False,
        }
