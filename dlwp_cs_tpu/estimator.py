"""High-level estimator facade: the one-object workflow API.

Capability parity with the reference's ``DLWPNeuralNet`` / ``DLWPFunctional``
wrappers (``DLWP/model/models.py`` — SURVEY.md §2 rows 6-7) plus
``util.save_model``/``load_model`` (§3.4): one object that bundles config,
model, normalization stats and parameters, with ``fit`` / ``forecast`` /
``save`` / ``load``.  Unlike the reference (pickled wrapper + Keras h5 +
custom_objects registry), everything persists as orbax pytree checkpoints +
JSON config, reconstructable from artifacts alone.

The lower-level pieces (Trainer, SeriesDataset, TimeSeriesEstimator) remain
directly usable; this facade just wires them the way the examples do.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.data.prefetch import prefetch_to_device
from dlwp_cs_tpu.data.series import SeriesDataset
from dlwp_cs_tpu.geometry.cubed_sphere import CubedSphere
from dlwp_cs_tpu.models import build_model
from dlwp_cs_tpu.models.config import ExperimentConfig
from dlwp_cs_tpu.rollout.estimator import Forecast, TimeSeriesEstimator
from dlwp_cs_tpu.train.train_step import init_state, make_optimizer
from dlwp_cs_tpu.train.trainer import Trainer
from dlwp_cs_tpu.utils.checkpoint import (
    load_json,
    restore_checkpoint,
    save_checkpoint,
    save_json,
)

__all__ = ["DLWPEstimator"]


class DLWPEstimator:
    """Config-driven train/forecast/save/load in one object."""

    def __init__(self, config: ExperimentConfig):
        self.config = config
        self.model = build_model(config.resolved_model())
        self.cs = CubedSphere(config.data.grid_n)
        self.state = None
        self.stats: dict | None = None

    # -- data wiring -------------------------------------------------------
    def _dataset(self, store, *, shuffle: bool) -> SeriesDataset:
        lat, lon = self.cs.cell_latlon
        ds = SeriesDataset(
            store,
            self.config.data,
            lat=lat,
            lon=lon,
            batch_size=self.config.train.batch_size,
            shuffle=shuffle,
            seed=self.config.train.seed,
            interval=self.config.data.interval,
        )
        # The rollout advances its insolation clock and labels lead_hours by
        # step_hours; training windows stride the store by interval.  A
        # mismatch (e.g. a 3-hourly store with default step_hours=6 and
        # interval=1) silently phase-shifts the forcing and mislabels leads.
        self._check_store_spacing(store)
        return ds

    def _check_store_spacing(self, store):
        """The same interval x step_hours guard ``_dataset`` applies at
        training time: a mismatched store fed to ``forecast``/
        ``forecast_lagged`` would silently phase-shift the insolation
        forcing and mislabel ``lead_hours``."""
        times = np.asarray(store.times, np.float64)
        dt = np.diff(times)
        if len(dt) and not np.allclose(dt, dt[0], rtol=1e-6):
            raise ValueError("store times are not uniformly spaced")
        if len(dt):
            eff_hours = float(dt[0]) * self.config.data.interval * 24.0
            if abs(eff_hours - self.config.data.step_hours) > 1e-6:
                raise ValueError(
                    f"store spacing x interval = {eff_hours:g} h per model "
                    f"step, but DataConfig.step_hours = "
                    f"{self.config.data.step_hours:g} — set interval/"
                    "step_hours so they agree"
                )

    def _norm_fn(self, store):
        """Window normalizer: ``(x - mean)/std``, or identity for a
        pre-normalized training cache (``attrs['normalized']`` — the
        contract :class:`~dlwp_cs_tpu.data.SeriesDataset` honors at fit
        time; applying the stats again here would silently double-normalize
        the forecast inputs)."""
        if getattr(store, "attrs", {}).get("normalized"):
            return lambda x: np.asarray(x, np.float32)
        mean = np.asarray(self.stats["mean"], np.float32)
        std = np.asarray(self.stats["std"], np.float32)
        return lambda x: (np.asarray(x, np.float32) - mean) / std

    def _capture_stats(self, store, ds: SeriesDataset) -> None:
        self.stats = {
            "mean": [float(v) for v in store.mean],
            "std": [float(v) for v in store.std],
            "insol_mean": ds.insol_mean,
            "insol_std": ds.insol_std,
        }

    # -- training ----------------------------------------------------------
    def fit(self, store, *, val_store=None, workdir=None, epochs=None,
            mesh=None, verbose: bool = True):
        """Train on a predictor store; returns self.

        ``mesh``: optional device mesh for GSPMD data-parallel training
        (batch sharded over the 'data' axis).
        """
        train_ds = self._dataset(store, shuffle=True)
        self._capture_stats(store, train_ds)
        val_ds = self._dataset(val_store, shuffle=False) if val_store else None
        trainer = Trainer(
            self.model,
            self.config.train,
            area_weights=(
                self.cs.area_weights
                if self.config.train.area_weighted_loss
                else None
            ),
            workdir=workdir,
            mesh=mesh,
        )
        if self.state is None:
            x0, _ = train_ds.make_batch(train_ds._starts[:1])
            self.state = trainer.init(jnp.asarray(x0))
        self.state = trainer.fit(
            self.state,
            lambda: prefetch_to_device(iter(train_ds)),
            val_data=(lambda: prefetch_to_device(iter(val_ds))) if val_ds else None,
            epochs=epochs,
            verbose=verbose,
        )
        self._last_history = trainer.history
        return self

    # -- inference ---------------------------------------------------------
    def forecast(self, store, *, init_indices, steps: int) -> Forecast:
        """Autoregressive forecast from store samples (normalized output).

        ``init_indices``: store sample indices of each initialization's LAST
        input time; ``steps``: model calls (each emits output_time_steps).
        """
        if self.state is None or self.stats is None:
            raise RuntimeError("fit or load the estimator first")
        dcfg = self.config.data
        t_in = dcfg.input_time_steps
        iv = dcfg.interval
        self._check_store_spacing(store)
        norm = self._norm_fn(store)
        init_indices = np.asarray(init_indices)
        need = (t_in - 1) * iv
        if np.any(init_indices < need):
            bad = int(init_indices[init_indices < need][0])
            raise ValueError(
                f"init index {bad} needs {need} preceding store samples for "
                f"a {t_in}-step input window at interval {iv}"
            )
        windows = np.stack(
            [norm(store.fields[i - need : i + 1 : iv]) for i in init_indices]
        )
        constants = None
        if store.constants is not None and len(dcfg.constants):
            from dlwp_cs_tpu.data.store import select_constants

            constants = select_constants(store, dcfg.constants)
        lat, lon = self.cs.cell_latlon
        est = TimeSeriesEstimator(
            apply_fn=self.model.apply,
            params=self.state.params,
            data_cfg=dcfg,
            lat=lat,
            lon=lon,
            constants=constants,
            insol_mean=self.stats["insol_mean"],
            insol_std=self.stats["insol_std"],
        )
        # Per-init valid times: each batch member gets insolation at its OWN
        # init time (a scalar here would silently phase-shift every member
        # after the first by up to (B-1)*dt of diurnal forcing).  Passed as
        # float64 — predict reduces mod the insolation period BEFORE the f32
        # cast, keeping ~10 s clock resolution for present-day epochs.
        t0 = np.asarray(store.times, np.float64)[init_indices]
        return est.predict(jnp.asarray(windows), t0, steps=steps)

    def forecast_lagged(self, store, *, init_indices, steps: int, lags,
                        keep_members: bool = False):
        """Lagged-average-forecast ensemble from store samples.

        Member ``m`` initializes ``lags[m]`` model steps earlier than each
        control index (``lags[0]`` must be 0); every member rolls far
        enough to cover the control lead times and is valid-time aligned on
        device (:func:`dlwp_cs_tpu.rollout.make_lagged_rollout`).  Returns
        a normalized :class:`~dlwp_cs_tpu.rollout.EnsembleForecast`.
        """
        if self.state is None or self.stats is None:
            raise RuntimeError("fit or load the estimator first")
        dcfg = self.config.data
        t_in = dcfg.input_time_steps
        iv = dcfg.interval
        lags = tuple(int(g) for g in lags)
        self._check_store_spacing(store)
        norm = self._norm_fn(store)
        init_indices = np.asarray(init_indices)
        need = (t_in - 1) * iv + max(lags) * iv
        if np.any(init_indices < need):
            bad = int(init_indices[init_indices < need][0])
            raise ValueError(
                f"init index {bad} needs {need} preceding store samples for "
                f"a {t_in}-step window at interval {iv} with max lag "
                f"{max(lags)}"
            )
        # per-window slices straight off the (possibly HDF5-backed) store —
        # never materialize the full series on the host
        win = (t_in - 1) * iv
        windows = np.stack(
            [
                np.stack(
                    [
                        norm(store.fields[i - g * iv - win : i - g * iv + 1 : iv])
                        for g in lags
                    ]
                )
                for i in init_indices
            ]
        )  # (B, M, T_in, 6, n, n, C)
        constants = None
        if store.constants is not None and len(dcfg.constants):
            from dlwp_cs_tpu.data.store import select_constants

            constants = select_constants(store, dcfg.constants)
        lat, lon = self.cs.cell_latlon
        from dlwp_cs_tpu.geometry.insolation import INSOLATION_PERIOD_DAYS
        from dlwp_cs_tpu.rollout import make_lagged_rollout

        # cache key includes everything the closure bakes in besides params
        # (which are a call argument): a re-fit changes the insolation
        # stats, and a different store can carry different constants —
        # either must miss the cache, not silently reuse stale state
        const_tag = (
            None if constants is None
            else hash(np.asarray(constants, np.float32).tobytes())
        )
        key = (steps, lags, keep_members,
               float(self.stats["insol_mean"]),
               float(self.stats["insol_std"]), const_tag)
        cache = self.__dict__.setdefault("_lagged_cache", {})
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(make_lagged_rollout(
                self.model.apply,
                dcfg,
                lat=lat,
                lon=lon,
                constants=None if constants is None else jnp.asarray(constants),
                insol_mean=self.stats["insol_mean"],
                insol_std=self.stats["insol_std"],
                steps=steps,
                lags=lags,
                keep_members=keep_members,
            ))
            cache[key] = fn
        t0 = np.asarray(store.times, np.float64)[init_indices]
        t0_red = np.mod(t0, INSOLATION_PERIOD_DAYS).astype(np.float32)
        fc = fn(self.state.params, jnp.asarray(windows), t0_red)
        return fc._replace(
            init_times=t0, variables=tuple(dcfg.variables)
        )

    def denormalize(self, fields):
        """Undo the store normalization on forecast fields."""
        mean = np.asarray(self.stats["mean"], np.float32)
        std = np.asarray(self.stats["std"], np.float32)
        return np.asarray(fields) * std + mean

    # -- persistence -------------------------------------------------------
    def save(self, path) -> Path:
        if self.state is None or self.stats is None:
            raise RuntimeError("nothing to save: fit or load first")
        path = Path(path)
        save_checkpoint(path, self.state, step=int(self.state.step))
        save_json(path / "experiment.json", self.config.to_json())
        save_json(path / "stats.json", self.stats)
        return path

    @classmethod
    def load(cls, path) -> "DLWPEstimator":
        path = Path(path)
        config = ExperimentConfig.from_json(load_json(path / "experiment.json"))
        self = cls(config)
        n = config.data.grid_n
        x0 = jnp.zeros((1, 6, n, n, config.data.input_channels))
        params = self.model.init(jax.random.PRNGKey(0), x0)
        template = init_state(params, make_optimizer(config.train))
        self.state, _ = restore_checkpoint(path, template)
        self.stats = load_json(path / "stats.json")
        return self

    def replace_config(self, **kwargs) -> "DLWPEstimator":
        """New estimator with updated config fields (state not carried)."""
        return DLWPEstimator(dataclasses.replace(self.config, **kwargs))
