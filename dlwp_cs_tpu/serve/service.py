"""Production forecast serving: batched autoregressive inference.

The reference has no serving story — its inference path is a host-driven
``model.predict`` loop inside a notebook (``DLWP/model/extensions.py``,
SURVEY.md §3.3).  This module is the deployment-shaped counterpart for the
TPU rebuild: one resident model, the 56-step rollout compiled once per
(batch-bucket, steps) as a single ``lax.scan`` executable, and a
micro-batching front end that coalesces concurrent single-member requests
into one device dispatch (the rollout is nearly batch-size-invariant on the
MXU at DLWP shapes, so coalescing is ~free throughput).

Request contract: a RAW (physical-units) input window ``(T_in, 6, n, n,
C_var)`` plus its init time; the service applies the training
normalization, rolls out, and returns denormalized fields — callers never
see the internal scaling.

Pieces:

* :class:`ForecastService` — normalize → rollout → denormalize, a direct
  ``forecast`` call and a ``submit`` future API with micro-batching.
* :mod:`dlwp_cs_tpu.serve.http` — a stdlib HTTP front end speaking npz.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from dlwp_cs_tpu.rollout.estimator import Forecast, TimeSeriesEstimator

__all__ = ["ForecastService", "MicroBatcher", "ServiceStats"]


@dataclass
class ServiceStats:
    """Counters for observability (returned by ``ForecastService.stats``)."""

    requests: int = 0
    batches: int = 0
    padded_members: int = 0
    device_seconds: float = 0.0

    @property
    def mean_batch(self) -> float:
        return self.requests / self.batches if self.batches else 0.0


def _resolve(fut: Future, *, result=None, error=None):
    """Resolve a waiter's future, tolerating caller-side cancellation: a
    cancelled Future raises InvalidStateError on set_result/set_exception,
    which must not kill the batcher worker thread."""
    try:
        if error is not None:
            fut.set_exception(error)
        else:
            fut.set_result(result)
    except Exception:  # noqa: BLE001 — cancelled/already-resolved future
        pass


def _bucket(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n (capped at max_batch) — bounds the jit
    cache to log2(max_batch)+1 executables per steps value."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class MicroBatcher:
    """Shared micro-batching front end: coalesces concurrent single-member
    ``submit`` requests into one ``forecast`` device dispatch (padded to
    the next power-of-two bucket, padding members discarded).

    Subclasses provide ``forecast(window, t0_days, *, steps, normalized)``
    and ``_check_window(window)`` and call :meth:`_init_batcher` in their
    constructor.  Used by :class:`ForecastService` (live estimator) and
    :class:`dlwp_cs_tpu.serve.export.ExportedForecastService` (AOT
    artifact), so the HTTP front end serves either.
    """

    def _init_batcher(self, max_batch: int, max_wait_ms: float):
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.stats = ServiceStats()
        self._queue: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._worker: threading.Thread | None = None
        self._closed = False

    def submit(self, window, t0_days, *, steps: int,
               normalized: bool = False) -> Future:
        """Enqueue a single-member request; returns a Future[Forecast].

        Concurrent submissions with the same ``steps`` coalesce into one
        device dispatch.  The worker thread starts lazily on first use.
        """
        window = self._check_window(window)
        if window.shape[0] != 1:
            raise ValueError(
                "submit takes one member per request; use forecast() for "
                "explicit batches"
            )
        fut: Future = Future()
        with self._lock:
            # closed-check + enqueue must be atomic against close(): an
            # item enqueued after the close sentinel would never be served
            # and its future would never resolve
            if self._closed:
                raise RuntimeError("service is closed")
            self._queue.put((window, float(np.asarray(t0_days).reshape(())),
                             int(steps), bool(normalized), fut))
            if self._worker is None:
                self._worker = threading.Thread(
                    target=self._run_worker, name="forecast-batcher",
                    daemon=True,
                )
                self._worker.start()
        return fut

    def _run_worker(self):
        while True:
            item = self._queue.get()
            if item is None:
                return
            batch = [item]
            key = (item[2], item[3])  # (steps, normalized)
            deadline = time.monotonic() + self.max_wait_s
            stash = []
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    # sentinel mid-collection: keep draining — re-enqueue it
                    # behind any stashed requests so they are served before
                    # the worker exits
                    stash.append(None)
                    break
                if (nxt[2], nxt[3]) == key:
                    batch.append(nxt)
                else:
                    stash.append(nxt)
            self._flush(batch, key, stash)

    def _flush(self, batch, key, stash):
        # re-enqueue mismatched-steps requests (and a deferred close
        # sentinel, which stays behind them) for the next round first
        for it in stash:
            self._queue.put(it)
        steps, normalized = key
        windows = np.concatenate([b[0] for b in batch], axis=0)
        t0 = np.asarray([b[1] for b in batch], np.float64)
        bucket = _bucket(len(batch), self.max_batch)
        pad = bucket - len(batch)
        if pad:
            windows = np.concatenate(
                [windows, np.repeat(windows[-1:], pad, axis=0)], axis=0
            )
            t0 = np.concatenate([t0, np.repeat(t0[-1:], pad)])
        try:
            fc = self.forecast(windows, t0, steps=steps,
                               normalized=normalized)
        except Exception as e:  # noqa: BLE001 — propagate to every waiter
            for b in batch:
                _resolve(b[4], error=e)
            return
        with self._lock:
            self.stats.requests += len(batch)
            self.stats.batches += 1
            self.stats.padded_members += pad
        for i, b in enumerate(batch):
            _resolve(
                b[4],
                result=fc._replace(
                    fields=fc.fields[i : i + 1],
                    init_times=np.asarray([b[1]]),
                ),
            )

    def close(self):
        """Stop the batching worker (pending requests are flushed first)."""
        with self._lock:
            self._closed = True
            worker = self._worker
            if worker is not None:
                self._queue.put(None)  # after any in-flight submit's item
        if worker is not None:
            worker.join(timeout=30)
            self._worker = None


class ForecastService(MicroBatcher):
    """Batched rollout serving on top of a fitted/loaded ``DLWPEstimator``.

    Args:
      estimator: a fitted or loaded :class:`~dlwp_cs_tpu.estimator
        .DLWPEstimator` (or use :meth:`load` with a checkpoint path).
      constants: optional ``(6, n, n, K)`` normalized static channels in
        ``DataConfig.constants`` order.  Required when the model was trained
        with constant channels — they live in the predictor store, not the
        checkpoint; pass them (or a store via ``constants_store``) at
        deployment time.
      constants_store: optional store object with ``constants`` /
        ``constant_names`` to pull the channels from.
      max_batch: micro-batching cap (requests per device dispatch).
      max_wait_ms: how long the batcher holds the first request of a batch
        while waiting for peers to coalesce.
      quantize: run the 3x3 convolutions in int8 (``conv_backend='int8'`` —
        :mod:`dlwp_cs_tpu.ops.quant`).  NOTE: measured 1.7-3.1x SLOWER
        than the default bf16 path for the full rollout at DLWP shapes on
        v5e (tools/serve_bench.py; PERF.md round 4 — the model is
        seam-/bandwidth-bound, and dynamic quantization costs a full HBM
        pass per conv).  Kept for larger-grid/fatter-channel deployments
        and as the measured record; accuracy pinned in tests/test_quant.py.
        The checkpoint's bf16/f32 params are quantized at trace time;
        nothing about persistence changes.
      mesh: optional device mesh — the model forward runs domain-decomposed
        under :func:`dlwp_cs_tpu.parallel.make_spatial_apply` (batch over
        the ``data`` axis, face rows over ``spatial``), for grids too large
        for one chip.  Batches are padded to a multiple of the data-axis
        size internally.  Incompatible with ``quantize`` (the sharded path
        installs its own band conv under every 3x3 — the int8 dispatch
        would be silently ignored, so it is rejected instead).
    """

    def __init__(self, estimator, *, constants=None, constants_store=None,
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 quantize: bool = False, mesh=None):
        if estimator.state is None or estimator.stats is None:
            raise RuntimeError("estimator has no state: fit or load it first")
        self.config = estimator.config
        dcfg = self.config.data
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
        self._mean = np.asarray(stats["mean"], np.float32)
        self._std = np.asarray(stats["std"], np.float32)
        apply_fn = estimator.model.apply
        self.quantized = bool(quantize)
        self._data_div = 1
        if quantize and mesh is not None:
            raise ValueError(
                "quantize=True is incompatible with mesh= (the sharded band "
                "conv would silently override the int8 dispatch)"
            )
        if quantize:
            import dataclasses as _dc

            from dlwp_cs_tpu.models import build_model

            # same param tree, int8 conv dispatch at apply time
            apply_fn = build_model(
                _dc.replace(
                    estimator.config.resolved_model(), conv_backend="int8"
                )
            ).apply
        if mesh is not None:
            from dlwp_cs_tpu.parallel import DATA_AXIS, make_spatial_apply

            apply_fn = make_spatial_apply(apply_fn, mesh, jit=False)
            self._data_div = int(mesh.shape[DATA_AXIS])
        self._est = TimeSeriesEstimator(
            apply_fn=apply_fn,
            params=estimator.state.params,
            data_cfg=dcfg,
            lat=lat,
            lon=lon,
            constants=None if constants is None else jnp.asarray(constants),
            insol_mean=stats["insol_mean"],
            insol_std=stats["insol_std"],
        )
        self._init_batcher(max_batch, max_wait_ms)
        self._ens_lock = threading.Lock()

    @classmethod
    def load(cls, path, **kwargs) -> "ForecastService":
        """Build a service from a ``DLWPEstimator.save`` checkpoint dir."""
        from dlwp_cs_tpu.estimator import DLWPEstimator

        return cls(DLWPEstimator.load(Path(path)), **kwargs)

    def info(self) -> dict:
        """Model/grid metadata for the HTTP ``/info`` endpoint."""
        dcfg = self.config.data
        return {
            "grid_n": dcfg.grid_n,
            "variables": list(dcfg.variables),
            "constants": list(dcfg.constants),
            "input_time_steps": dcfg.input_time_steps,
            "output_time_steps": dcfg.output_time_steps,
            "step_hours": dcfg.step_hours,
            "add_insolation": dcfg.add_insolation,
            "quantized": self.quantized,
        }

    # -- core path -----------------------------------------------------------
    def _window_shape(self):
        dcfg = self.config.data
        n = dcfg.grid_n
        return (dcfg.input_time_steps, 6, n, n, dcfg.n_variables)

    def _check_window(self, window) -> np.ndarray:
        window = np.asarray(window, np.float32)
        want = self._window_shape()
        if window.shape == want:
            window = window[None]
        elif window.ndim != 6 or window.shape[1:] != want:
            raise ValueError(
                f"window must be {want} or (B,) + that shape, got "
                f"{window.shape}"
            )
        return window

    def forecast(self, window, t0_days, *, steps: int,
                 normalized: bool = False) -> Forecast:
        """Synchronous forecast of one window batch.

        ``window``: raw ``(T_in, 6, n, n, C_var)`` (or with a leading batch
        dim); ``t0_days``: scalar / (B,) init times in days since
        2000-01-01.  Returns a denormalized :class:`Forecast` unless
        ``normalized=True`` (then both input and output stay in
        training-normalized units).
        """
        window = self._check_window(window)
        if not normalized:
            window = (window - self._mean) / self._std
        t0 = np.atleast_1d(np.asarray(t0_days, np.float64))
        if t0.shape[0] == 1 and window.shape[0] > 1:
            t0 = np.repeat(t0, window.shape[0])
        if t0.shape[0] != window.shape[0]:
            raise ValueError(
                f"t0_days batch {t0.shape[0]} != window batch "
                f"{window.shape[0]}"
            )
        b = window.shape[0]
        pad = (-b) % self._data_div  # mesh data-axis divisibility
        if pad:
            window = np.concatenate(
                [window, np.repeat(window[-1:], pad, axis=0)], axis=0
            )
            t0 = np.concatenate([t0, np.repeat(t0[-1:], pad)])
        t0_wall = time.perf_counter()
        fc = self._est.predict(jnp.asarray(window), t0, steps=steps)
        fields = np.asarray(fc.fields)[:b]
        fc = fc._replace(init_times=np.asarray(fc.init_times)[:b])
        with self._lock:
            self.stats.device_seconds += time.perf_counter() - t0_wall
        if not normalized:
            fields = fields * self._std + self._mean
        return fc._replace(fields=fields)

    def forecast_ensemble(self, window, t0_days, *, steps: int,
                          members: int, amplitude=0.05, key=None,
                          antithetic: bool = True,
                          keep_members: bool = False,
                          normalized: bool = False):
        """Perturbed-IC ensemble forecast of one window batch.

        Same raw-units contract as :meth:`forecast`; ``amplitude`` is the
        IC perturbation standard deviation in NORMALIZED units (scalar or
        per-variable ``(C_var,)``).  Members fold into the batch of one
        device dispatch (:mod:`dlwp_cs_tpu.rollout.ensemble`); returns an
        :class:`~dlwp_cs_tpu.rollout.ensemble.EnsembleForecast` with
        ``mean``/``spread`` (and ``members`` when kept) denormalized unless
        ``normalized=True``.
        """
        window = self._check_window(window)
        if not normalized:
            window = (window - self._mean) / self._std
        t0 = np.atleast_1d(np.asarray(t0_days, np.float64))
        if t0.shape[0] == 1 and window.shape[0] > 1:
            t0 = np.repeat(t0, window.shape[0])
        if t0.shape[0] != window.shape[0]:
            raise ValueError(
                f"t0_days batch {t0.shape[0]} != window batch "
                f"{window.shape[0]}"
            )
        b = window.shape[0]
        # mesh data-axis divisibility: the rollout batch is b * members, so
        # pad b to the smallest b' with (b' * members) % data_div == 0
        import math

        unit = self._data_div // math.gcd(members, self._data_div)
        pad = (-b) % unit
        if pad:
            window = np.concatenate(
                [window, np.repeat(window[-1:], pad, axis=0)], axis=0
            )
            t0 = np.concatenate([t0, np.repeat(t0[-1:], pad)])
        with self._ens_lock:
            # one lock for lazy init AND dispatch: concurrent handler
            # threads would otherwise duplicate the steps-long rollout
            # compile (the device serializes execution anyway)
            ens = self.__dict__.get("_ens")
            if ens is None:
                from dlwp_cs_tpu.rollout.ensemble import EnsembleForecaster

                e = self._est
                ens = EnsembleForecaster(
                    apply_fn=e.apply_fn, params=e.params, data_cfg=e.data_cfg,
                    lat=e.lat, lon=e.lon, constants=e.constants,
                    insol_mean=e.insol_mean, insol_std=e.insol_std,
                )
                self.__dict__["_ens"] = ens
            t0_wall = time.perf_counter()
            fc = ens.predict(
                jnp.asarray(window), t0, steps=steps, members=members,
                amplitude=amplitude, key=key, antithetic=antithetic,
                keep_members=keep_members,
            )
        mean = np.asarray(fc.mean)[:b]
        spread = np.asarray(fc.spread)[:b]
        mem = None if fc.members is None else np.asarray(fc.members)[:b]
        fc = fc._replace(init_times=np.asarray(fc.init_times)[:b])
        with self._lock:
            self.stats.device_seconds += time.perf_counter() - t0_wall
            self.stats.requests += b
            self.stats.batches += 1
            self.stats.padded_members += pad
        if not normalized:
            mean = mean * self._std + self._mean
            spread = spread * self._std  # scale-only: spread has no offset
            if mem is not None:
                mem = mem * self._std + self._mean
        return fc._replace(mean=mean, spread=spread, members=mem)
