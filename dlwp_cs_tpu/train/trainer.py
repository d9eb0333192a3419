"""Epoch-level training loop with callbacks-equivalents.

Capability parity with the reference's Keras ``fit``/callback stack
(SURVEY.md §2 row 5): ``EarlyStoppingMin`` (early stopping with a minimum
epoch floor and best-weights restore), ``SaveWeightsOnEpoch`` (periodic
checkpointing), and ``History``/``BatchHistory`` (metric records) — but
implemented as plain Python around a jitted step function, with structured
jsonl metric logging and an optional jax profiler capture window
(SURVEY.md §5.1, §5.5).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dlwp_cs_tpu.models.config import TrainConfig
from dlwp_cs_tpu.train.train_step import (
    TrainState,
    init_state,
    make_eval_step,
    make_loss_fn,
    make_optimizer,
    make_train_step,
)

__all__ = ["Trainer", "EarlyStoppingMin", "History"]


@dataclass
class EarlyStoppingMin:
    """Early stopping with a minimum-epochs floor and best-weights tracking.

    Mirrors the reference's ``EarlyStoppingMin`` Keras callback: never stop
    before ``min_epochs``; stop after ``patience`` epochs without
    improvement; optionally restore the best parameters on stop.
    """

    patience: int = 50
    min_epochs: int = 0
    min_delta: float = 0.0
    best: float = float("inf")
    best_params: Any = None
    wait: int = 0

    def update(self, epoch: int, value: float, params) -> bool:
        """Record an epoch's monitored value; returns True to stop.

        ``params`` may be the parameter pytree itself or a zero-arg callable
        producing it — the callable is only invoked on improvement, so
        callers can avoid a device->host snapshot on non-improving epochs.
        """
        if value < self.best - self.min_delta:
            self.best = value
            self.best_params = params() if callable(params) else params
            self.wait = 0
        else:
            self.wait += 1
        return epoch + 1 >= self.min_epochs and self.wait >= self.patience


@dataclass
class History:
    """Per-epoch and per-step metric records (the Keras History analog)."""

    epochs: list[dict] = field(default_factory=list)
    steps: list[dict] = field(default_factory=list)


class Trainer:
    """Drives training of a flax model over an iterable data source.

    Args:
      model: flax module with ``apply``.
      cfg: TrainConfig.
      area_weights: optional (6, n, n) weights for area-weighted loss.
      workdir: if set, writes ``metrics.jsonl`` and periodic orbax
        checkpoints under it.
      profile_steps: if ``(start, stop)``, captures a jax profiler trace of
        those global steps into ``workdir/profile``.
      mesh: optional ``('data', 'spatial')`` mesh — enables GSPMD
        data-parallel training (batch sharded over 'data'; global batch must
        divide by the data axis size).
      dp_impl: ``'gspmd'`` (default) or ``'shard_map'`` — the latter traces
        the per-shard step as single-device code, keeping the fused Pallas
        conv eligible on multi-chip TPU meshes (equivalence pinned by
        tests/test_parallel.py).
    """

    def __init__(
        self,
        model,
        cfg: TrainConfig,
        *,
        area_weights=None,
        workdir: str | Path | None = None,
        profile_steps: tuple[int, int] | None = None,
        mesh=None,
        dp_impl: str = "gspmd",
    ):
        self.model = model
        self.cfg = cfg
        self.optimizer = make_optimizer(cfg)
        self.loss_fn = make_loss_fn(cfg, area_weights)
        self.mesh = mesh
        if mesh is None:
            self.train_step = make_train_step(
                model.apply, self.optimizer, self.loss_fn
            )
        else:
            # Data-parallel step over the mesh's 'data' axis
            # (SURVEY.md §7 M5 / BASELINE config 4).
            from dlwp_cs_tpu.parallel.sharding import (
                make_dp_shardmap_train_step,
                make_dp_train_step,
            )

            if dp_impl not in ("gspmd", "shard_map"):
                raise ValueError(f"dp_impl must be gspmd|shard_map, got {dp_impl!r}")
            maker = (
                make_dp_shardmap_train_step
                if dp_impl == "shard_map"
                else make_dp_train_step
            )
            self.train_step = maker(
                model.apply, self.optimizer, self.loss_fn, mesh
            )
        self.dp_impl = dp_impl
        if mesh is None:
            self.eval_step = make_eval_step(model.apply, self.loss_fn)
        else:
            from dlwp_cs_tpu.parallel.sharding import (
                make_dp_eval_step,
                make_dp_shardmap_eval_step,
            )

            eval_maker = (
                make_dp_shardmap_eval_step
                if dp_impl == "shard_map"
                else make_dp_eval_step
            )
            self.eval_step = eval_maker(model.apply, self.loss_fn, mesh)
        # k-step fused dispatch (one jitted lax.scan per k batches) — built
        # on first use; see TrainConfig.fused_steps.
        self.fused_steps = max(1, int(getattr(cfg, "fused_steps", 1)))
        self._fused_step = None
        self.workdir = Path(workdir) if workdir is not None else None
        if profile_steps is not None and self.workdir is None:
            raise ValueError("profile_steps requires a workdir for the trace")
        self.profile_steps = profile_steps
        self._epochs_done = 0  # set by restore_or_init on resume
        # Early-stopping state spans the WHOLE run (across restarts): fit
        # reuses this stopper when set; restore_or_init rebuilds it from the
        # checkpoint extras so a resumed run honors the full-run best/patience
        # contract (the reference's restore_best_weights semantics).
        self.stopper: EarlyStoppingMin | None = None
        self.history = History()
        self._metrics_file = None
        if self.workdir is not None:
            self.workdir.mkdir(parents=True, exist_ok=True)
            self._metrics_file = (self.workdir / "metrics.jsonl").open("a")

    # -- lifecycle ---------------------------------------------------------
    def init(self, sample_inputs, seed: int | None = None) -> TrainState:
        seed = self.cfg.seed if seed is None else seed
        params = self.model.init(jax.random.PRNGKey(seed), sample_inputs)
        return init_state(params, self.optimizer)

    def restore_or_init(self, sample_inputs, seed: int | None = None) -> TrainState:
        """Resume from the latest workdir checkpoint, else fresh init.

        The fail-stop recovery story (SURVEY.md §5.3): a crashed run is
        restarted with the same command and picks up at its last periodic
        checkpoint — restoration is idempotent by step.  The completed-epoch
        count AND the early-stopping state (best value, patience counter,
        best-params snapshot) ride in the checkpoint, so the resumed ``fit``
        trains only the REMAINING epochs of ``max_epochs``, continues logs/
        checkpoints at the global epoch index, and stops/restores exactly as
        the uninterrupted run would (the reference's whole-run
        restore-best-weights semantics — VERDICT r2 weak #5).
        """
        template = self.init(sample_inputs, seed)
        if self.workdir is None:
            return template
        from dlwp_cs_tpu.utils.checkpoint import (
            latest_step,
            restore_aux,
            restore_checkpoint,
        )

        ckpt_dir = self.workdir / "checkpoints"
        if latest_step(ckpt_dir) is None:
            return template
        state, extras = restore_checkpoint(ckpt_dir, template)
        if extras:
            self._epochs_done = int(extras.get("epochs_done", 0))
            es = extras.get("early_stopping")
            if es is not None:
                self.stopper = EarlyStoppingMin(
                    patience=self.cfg.early_stopping_patience,
                    min_epochs=self.cfg.min_epochs,
                    best=(
                        float(es["best"])
                        if es.get("best") is not None
                        else float("inf")
                    ),
                    wait=int(es.get("wait", 0)),
                )
                if es.get("has_best_params"):
                    host_params = jax.tree.map(np.asarray, template.params)
                    self.stopper.best_params = restore_aux(
                        ckpt_dir, int(es["ckpt_step"]), "best_params", host_params
                    )
        return state

    def _get_fused_step(self):
        if self._fused_step is None:
            if self.mesh is None:
                from dlwp_cs_tpu.train.train_step import make_scanned_train_step

                self._fused_step = make_scanned_train_step(
                    self.model.apply, self.optimizer, self.loss_fn
                )
            else:
                from dlwp_cs_tpu.parallel.sharding import (
                    make_dp_scanned_train_step,
                    make_dp_shardmap_scanned_train_step,
                )

                maker = (
                    make_dp_shardmap_scanned_train_step
                    if self.dp_impl == "shard_map"
                    else make_dp_scanned_train_step
                )
                self._fused_step = maker(
                    self.model.apply, self.optimizer, self.loss_fn, self.mesh
                )
        return self._fused_step

    def _log(self, record: dict) -> None:
        if self._metrics_file is not None:
            self._metrics_file.write(json.dumps(record) + "\n")
            self._metrics_file.flush()

    def _checkpoint(
        self,
        state: TrainState,
        *,
        step: int,
        epochs_done: int,
        stopper: "EarlyStoppingMin | None" = None,
    ) -> None:
        # Keyed by the GLOBAL optimizer step (monotone across restarts):
        # keying by the per-run epoch index made a resumed run overwrite its
        # low-numbered checkpoints while latest_step kept selecting the
        # stale pre-crash file.
        if self.workdir is None:
            return
        from dlwp_cs_tpu.utils.checkpoint import save_checkpoint

        extras: dict = {"epochs_done": epochs_done}
        aux = None
        if stopper is not None:
            extras["early_stopping"] = {
                # None encodes +inf (strict-JSON safe)
                "best": stopper.best if np.isfinite(stopper.best) else None,
                "wait": stopper.wait,
                "has_best_params": stopper.best_params is not None,
                "ckpt_step": step,
            }
            # The best-params snapshot is already host-resident (numpy), so
            # this is a disk write, not a device sync.
            aux = {"best_params": stopper.best_params}
        save_checkpoint(
            self.workdir / "checkpoints",
            state,
            step=step,
            extras=extras,
            aux=aux,
        )

    # -- main loop ---------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        train_data,
        *,
        val_data=None,
        epochs: int | None = None,
        verbose: bool = True,
    ) -> TrainState:
        """Train; ``train_data``/``val_data`` are callables returning an
        iterable of (inputs, targets) per epoch (or plain reiterable
        iterables)."""
        cfg = self.cfg
        epochs = cfg.max_epochs if epochs is None else epochs
        if self.stopper is None:
            self.stopper = EarlyStoppingMin(
                patience=cfg.early_stopping_patience, min_epochs=cfg.min_epochs
            )
        stopper = self.stopper  # spans restarts — see restore_or_init
        # Host-side step counter: reading int(state.step) every step would be
        # a hidden device sync (the step counter lives on-device).
        gstep = int(state.step)
        metrics_every = max(1, int(getattr(cfg, "metrics_every", 1)))
        # Profiler window state lives ACROSS epochs: a capture whose stop
        # step falls in a later epoch must still be stopped.
        profiling = False
        for epoch in range(self._epochs_done, epochs):
            t0 = time.perf_counter()
            losses: list[float] = []
            # Buffered metric fetch: the jitted step returns device arrays;
            # converting them per step (float(...)) is a ~25 ms sync in this
            # environment (ADVICE r1) that serializes dispatch with compute.
            # We keep the device handles and fetch in ONE device_get every
            # `metrics_every` steps / at epoch end, so the host stays ahead.
            pending: list[tuple[int, Any, float, float]] = []
            # optimizer STEPS buffered since the last flush: a fused entry
            # carries fused_steps of them, so counting len(pending) would
            # stretch the configured cadence by fused_steps x
            pending_steps = 0
            t_flush = time.perf_counter()

            def flush():
                nonlocal t_flush, pending_steps
                if not pending:
                    return
                fetched = jax.device_get([m for _, m, _, _ in pending])
                # A fused dispatch returns (k,) metric vectors — one record
                # per optimizer step either way.
                loss_v = [
                    np.atleast_1d(np.asarray(m["loss"], np.float64))
                    for m in fetched
                ]
                gnorm_v = [
                    np.atleast_1d(np.asarray(m["grad_norm"], np.float64))
                    for m in fetched
                ]
                n_steps = sum(v.shape[0] for v in loss_v)
                wall = (time.perf_counter() - t_flush) / max(n_steps, 1)
                for (step_i, _, dispatch_s, data_wait), lv, gv in zip(
                    pending, loss_v, gnorm_v
                ):
                    k = lv.shape[0]
                    for j in range(k):
                        loss = float(lv[j])
                        losses.append(loss)
                        rec = {
                            "kind": "step",
                            "step": step_i + j,
                            "loss": loss,
                            "grad_norm": float(gv[j]),
                            # amortized wall seconds/step incl. compute
                            # (honest under buffered fetch); dispatch_s is
                            # host-only time, for the whole fused call
                            "step_s": wall,
                            "dispatch_s": dispatch_s,
                            "data_wait_s": data_wait,
                        }
                        self.history.steps.append(rec)
                        self._log(rec)
                pending.clear()
                pending_steps = 0
                t_flush = time.perf_counter()

            it = iter(_epoch_iter(train_data))
            fused = self.fused_steps
            while True:
                # Separate input-wait from compute: data_wait_s exposes input-
                # pipeline stalls (SURVEY.md §7 M4 — "measured via step-time
                # variance"); with prefetch it should be ~0.
                t_wait = time.perf_counter()
                chunk = []
                try:
                    while len(chunk) < fused:
                        chunk.append(next(it))
                except StopIteration:
                    pass
                data_wait = time.perf_counter() - t_wait
                if not chunk:
                    break
                if self.profile_steps is not None and (
                    gstep <= self.profile_steps[0] < gstep + len(chunk)
                ):
                    jax.profiler.start_trace(str(self.workdir / "profile"))
                    profiling = True
                if fused > 1 and len(chunk) == fused:
                    # k steps, ONE dispatch (stacked batches + lax.scan);
                    # a short tail chunk falls back to single steps below so
                    # the scan never recompiles for a ragged k.
                    inputs_k = _stack([c[0] for c in chunk])
                    targets_k = _stack([c[1] for c in chunk])
                    t_step = time.perf_counter()
                    state, metrics = self._get_fused_step()(
                        state, inputs_k, targets_k
                    )
                    dispatch_s = time.perf_counter() - t_step
                    pending.append((gstep, metrics, dispatch_s, data_wait))
                    gstep += len(chunk)
                    pending_steps += len(chunk)
                else:
                    for inputs, targets in chunk:
                        if self.mesh is not None:
                            from dlwp_cs_tpu.parallel.sharding import shard_batch

                            inputs, targets = shard_batch(
                                (inputs, targets), self.mesh
                            )
                        t_step = time.perf_counter()
                        state, metrics = self.train_step(state, inputs, targets)
                        dispatch_s = time.perf_counter() - t_step
                        pending.append((gstep, metrics, dispatch_s, data_wait))
                        gstep += 1
                        pending_steps += 1
                        data_wait = 0.0
                if profiling and gstep > self.profile_steps[1]:
                    jax.profiler.stop_trace()
                    profiling = False
                if pending_steps >= metrics_every:
                    flush()
            flush()
            train_loss = float(np.mean(losses)) if losses else float("nan")
            val_loss = None
            if val_data is not None:
                vlosses = []
                for vi, vt in _epoch_iter(val_data):
                    if self.mesh is not None:
                        from dlwp_cs_tpu.parallel.sharding import shard_batch

                        vi, vt = shard_batch((vi, vt), self.mesh)
                    vlosses.append(
                        float(self.eval_step(state.params, vi, vt)["loss"])
                    )
                val_loss = float(np.mean(vlosses)) if vlosses else float("nan")
            dt = time.perf_counter() - t0
            rec = {
                "kind": "epoch",
                "epoch": epoch,
                "train_loss": train_loss,
                "val_loss": val_loss,
                "seconds": dt,
            }
            self.history.epochs.append(rec)
            self._log(rec)
            if verbose:
                msg = f"epoch {epoch}: train_loss={train_loss:.6f}"
                if val_loss is not None:
                    msg += f" val_loss={val_loss:.6f}"
                print(msg + f" ({dt:.1f}s)")
            monitored = train_loss if val_loss is None else val_loss
            # Snapshot params to HOST memory before tracking as "best": the
            # jitted train step donates its state, so the device buffers of
            # this epoch's params are invalidated by the next epoch's first
            # step — storing them by reference would make best-weights
            # restore return deleted arrays.  The snapshot is lazy (only on
            # improving epochs) and skipped entirely when best-weights
            # restore is off — on this environment's remote tunnel a
            # params download costs ~0.2 s (PERF.md).
            if cfg.restore_best_weights:
                best_candidate = lambda: jax.tree.map(np.asarray, state.params)
            else:
                best_candidate = None
            # Stopper updates BEFORE the checkpoint so the persisted
            # early-stopping state includes this epoch (a resumed run sees
            # exactly what the uninterrupted run would have).
            should_stop = stopper.update(epoch, monitored, best_candidate)
            if (epoch + 1) % cfg.checkpoint_every_epochs == 0:
                self._checkpoint(
                    state, step=gstep, epochs_done=epoch + 1, stopper=stopper
                )
            if should_stop:
                if verbose:
                    print(f"early stopping at epoch {epoch} (best={stopper.best:.6f})")
                break
        if profiling:  # stop-step beyond the last step: close the capture
            jax.profiler.stop_trace()
        if cfg.restore_best_weights and stopper.best_params is not None:
            best = jax.tree.map(jnp.asarray, stopper.best_params)
            state = TrainState(best, state.opt_state, state.step)
        return state


def _epoch_iter(data):
    """Accept either an iterable of batches or a zero-arg callable yielding one."""
    return data() if callable(data) else data


def _stack(xs):
    """Stack k batches along a new leading (step) axis.

    Host batches stack on host (one transfer when dispatched); device-
    resident batches stack on device (no host round-trip).
    """
    if all(isinstance(x, np.ndarray) for x in xs):
        return np.stack(xs)
    return jnp.stack([jnp.asarray(x) for x in xs])
