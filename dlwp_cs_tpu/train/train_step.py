"""Jitted training step: loss, optimizer wiring, state.

Capability parity with the reference's ``model.compile(...)`` +
``model.fit`` Keras loop internals (SURVEY.md §3.2), redesigned TPU-first:

* one jitted ``train_step(state, batch) -> (state, metrics)`` with the state
  donated, so parameters/optimizer state never round-trip to host;
* loss = (optionally area-weighted) MSE/MAE summed over the whole multi-step
  output window — the reference's multi-output-loss training mode
  (``DLWPFunctional``, SURVEY.md §2 row 7) falls out naturally because the
  target window is just channels;
* bf16 compute happens inside the model (config switch); grads/params stay
  f32.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from dlwp_cs_tpu.models.config import TrainConfig
from dlwp_cs_tpu.ops.losses import AreaWeightedLoss, mae, mse

__all__ = [
    "TrainState",
    "make_optimizer",
    "make_loss_fn",
    "make_train_step",
    "make_scanned_train_step",
    "make_eval_step",
]


class TrainState(NamedTuple):
    """Pure-pytree training state (params, optimizer state, step counter)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Build the optax chain from config (adam/adamw/sgd + schedule + clip)."""
    lr = _make_schedule(cfg)
    if cfg.optimizer == "adam":
        opt = optax.adam(lr)
    elif cfg.optimizer == "adamw":
        opt = optax.adamw(lr, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    accum = max(1, int(getattr(cfg, "grad_accum_steps", 1)))
    if accum > 1:
        # k micro-batches per optimizer update; params stay fixed (updates
        # are zero) until the k-th step, so the effective batch is
        # k * batch_size at unchanged peak memory.
        opt = optax.MultiSteps(opt, every_k_schedule=accum)
    return opt


def _make_schedule(cfg: TrainConfig):
    """Learning-rate schedule from config."""
    sched = getattr(cfg, "lr_schedule", "constant")
    if sched == "constant":
        return cfg.learning_rate
    if sched == "cosine":
        return optax.cosine_decay_schedule(
            cfg.learning_rate, decay_steps=max(1, cfg.lr_decay_steps)
        )
    if sched == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=max(1, cfg.lr_warmup_steps),
            decay_steps=max(2, cfg.lr_decay_steps),
        )
    raise ValueError(f"unknown lr_schedule {sched!r}")


def make_loss_fn(cfg: TrainConfig, area_weights=None) -> Callable:
    """Return loss(pred, target) per config.

    ``area_weights``: optional (6, n, n) cell weights (CubedSphere.area_weights)
    used when cfg.area_weighted_loss is set.
    """
    if cfg.loss not in ("mse", "mae"):
        raise ValueError(f"unknown loss {cfg.loss!r}")
    if cfg.area_weighted_loss:
        if area_weights is None:
            raise ValueError("area_weighted_loss=True requires area_weights")
        # AreaWeightedLoss also carries the local_terms protocol, so the
        # same Trainer config works under the spatially sharded step.
        return AreaWeightedLoss(cfg.loss, area_weights)
    return mse if cfg.loss == "mse" else mae


def init_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(apply_fn, optimizer, loss_fn, *, jit: bool = True):
    """Build ``train_step(state, inputs, targets) -> (state, metrics)``.

    ``apply_fn(params, inputs) -> predictions``; state buffers are donated.
    """

    def step(state: TrainState, inputs, targets):
        def loss_of(params):
            pred = apply_fn(params, inputs)
            return loss_fn(pred, targets)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(params, opt_state, state.step + 1)
        metrics = {"loss": loss, "grad_norm": gnorm}
        return new_state, metrics

    if jit:
        return jax.jit(step, donate_argnums=(0,))
    return step


def make_scanned_train_step(apply_fn, optimizer, loss_fn, *, jit: bool = True):
    """Build ``step_k(state, inputs_k, targets_k) -> (state, metrics_k)``.

    Runs ``k`` optimizer steps as ONE dispatch via ``lax.scan`` over the
    leading (step) axis of the stacked batches; metrics come back as
    ``(k,)`` arrays.  This amortizes the host dispatch/roundtrip overhead
    across k steps — on this environment's remote-tunnel TPU that overhead
    is ~25-40 ms per call, i.e. 2-3x the compute itself at flagship size
    (PERF.md round 2), and on any hardware it keeps the host off the
    critical path for small fast steps.
    """
    base = make_train_step(apply_fn, optimizer, loss_fn, jit=False)

    def step_k(state: TrainState, inputs_k, targets_k):
        def body(st, batch):
            return base(st, batch[0], batch[1])

        return jax.lax.scan(body, state, (inputs_k, targets_k))

    if jit:
        return jax.jit(step_k, donate_argnums=(0,))
    return step_k


def make_eval_step(apply_fn, loss_fn, *, jit: bool = True):
    """Build ``eval_step(params, inputs, targets) -> metrics``."""

    def step(params, inputs, targets):
        pred = apply_fn(params, inputs)
        return {"loss": loss_fn(pred, targets)}

    return jax.jit(step) if jit else step
