"""Sharded training steps: GSPMD data-parallel and shard_map spatial paths.

Replaces the reference's entire parallelism story (a Keras ``gpus=n`` mirror,
SURVEY.md §2 row 12) with the two TPU-native modes of SURVEY.md §7 M5/M6:

* :func:`make_dp_train_step` — jit + ``NamedSharding``: batch sharded over
  the ``data`` axis, params replicated; XLA inserts the gradient psum over
  ICI.  This is the default scale path (pure GSPMD, no model changes).
* :func:`make_spatial_train_step` — ``jax.shard_map`` over
  ``('data', 'spatial')``: batch data-parallel *and* face rows domain-
  decomposed, with the explicit halo exchange of
  :mod:`dlwp_cs_tpu.parallel.halo` installed under every convolution.
  Gradients/losses are ``pmean``-ed over both axes.
"""

from __future__ import annotations

import contextlib

import jax
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlwp_cs_tpu.ops.padding import use_pad_impl
from dlwp_cs_tpu.parallel.halo import make_sharded_pad
from dlwp_cs_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    batch_spatial_sharding,
    replicated,
    stacked_batch_sharding,
)
from dlwp_cs_tpu.train.train_step import TrainState

__all__ = [
    "make_dp_train_step",
    "make_dp_shardmap_train_step",
    "make_dp_scanned_train_step",
    "make_dp_eval_step",
    "make_spatial_train_step",
    "make_spatial_apply",
    "sharded_model_ctx",
    "shard_batch",
]


def shard_batch(batch, mesh: Mesh, *, spatial: bool = False):
    """Device-put a (inputs, targets) batch with the canonical sharding."""
    maker = batch_spatial_sharding if spatial else batch_sharding
    return jax.tree.map(
        lambda x: jax.device_put(x, maker(mesh, ndim=x.ndim)), batch
    )


def make_dp_train_step(apply_fn, optimizer, loss_fn, mesh: Mesh):
    """GSPMD data-parallel train step (params replicated, batch sharded)."""

    def step(state: TrainState, inputs, targets):
        def loss_of(params):
            return loss_fn(apply_fn(params, inputs), targets)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }

    rep = replicated(mesh)
    # Shardings by pytree prefix: state replicated, batch over 'data'.
    in_shardings = (rep, batch_sharding(mesh), batch_sharding(mesh))
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_dp_shardmap_train_step(apply_fn, optimizer, loss_fn, mesh: Mesh):
    """Data-parallel step as ``shard_map`` (vs GSPMD in
    :func:`make_dp_train_step`): the per-shard forward/backward is traced as
    single-device code inside a :func:`~dlwp_cs_tpu.ops.conv.shard_local_region`,
    so the ``auto`` conv dispatch keeps the fused Pallas kernel on multi-chip
    TPU meshes (a ``pallas_call`` is opaque to the GSPMD partitioner, which
    forces the jit path back to ring-fix).  Gradients and loss are
    ``pmean``-ed over ``data``; params/optimizer state stay replicated.

    Numerically equivalent to the GSPMD step (equal-size shards; pinned by
    tests); use it whenever the model is *not* spatially decomposed.
    """
    local_step = _dp_local_step(apply_fn, optimizer, loss_fn)
    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def _dp_local_step(apply_fn, optimizer, loss_fn):
    """Per-shard train step for the shard_map DP variants: single-device
    trace inside a shard_local_region (keeps the fused Pallas conv),
    gradients/loss pmean-ed over the data axis."""
    from dlwp_cs_tpu.ops.conv import shard_local_region

    def local_step(state: TrainState, inputs, targets):
        def loss_of(params):
            with shard_local_region():
                return loss_fn(apply_fn(params, inputs), targets)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        grads = lax.pmean(grads, DATA_AXIS)
        loss = lax.pmean(loss, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }

    return local_step


def make_dp_shardmap_scanned_train_step(apply_fn, optimizer, loss_fn, mesh: Mesh):
    """shard_map analog of :func:`make_dp_scanned_train_step`: k optimizer
    steps per dispatch with the scan INSIDE the shard_map body, so the
    per-shard trace stays single-device code and the ``auto`` conv dispatch
    keeps the fused Pallas kernel (the reason one chooses
    ``dp_impl='shard_map'``; the GSPMD scanned step forces ring-fix)."""
    local_step = _dp_local_step(apply_fn, optimizer, loss_fn)

    def local_step_k(state: TrainState, inputs_k, targets_k):
        return lax.scan(
            lambda st, b: local_step(st, b[0], b[1]), state, (inputs_k, targets_k)
        )

    fn = jax.shard_map(
        local_step_k,
        mesh=mesh,
        in_specs=(P(), P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def make_dp_shardmap_eval_step(apply_fn, loss_fn, mesh: Mesh):
    """shard_map analog of :func:`make_dp_eval_step` (same Pallas-keeping
    rationale as the train variants)."""
    from dlwp_cs_tpu.ops.conv import shard_local_region

    def local_eval(params, inputs, targets):
        with shard_local_region():
            loss = loss_fn(apply_fn(params, inputs), targets)
        return {"loss": lax.pmean(loss, DATA_AXIS)}

    fn = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_dp_scanned_train_step(apply_fn, optimizer, loss_fn, mesh: Mesh):
    """Data-parallel variant of ``make_scanned_train_step``: k optimizer
    steps per dispatch over ``(k, B, ...)`` stacked batches, batch axis
    sharded over 'data' (the step axis is replicated — it is time, not
    data)."""

    def step(state: TrainState, inputs, targets):
        def loss_of(params):
            return loss_fn(apply_fn(params, inputs), targets)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }

    def step_k(state: TrainState, inputs_k, targets_k):
        return lax.scan(lambda st, b: step(st, b[0], b[1]), state, (inputs_k, targets_k))

    rep = replicated(mesh)
    sbs = stacked_batch_sharding(mesh)
    return jax.jit(
        step_k,
        in_shardings=(rep, sbs, sbs),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_dp_eval_step(apply_fn, loss_fn, mesh: Mesh):
    """GSPMD data-parallel eval step (params replicated, batch sharded)."""

    def step(params, inputs, targets):
        return {"loss": loss_fn(apply_fn(params, inputs), targets)}

    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, batch_sharding(mesh), batch_sharding(mesh)),
        out_shardings=rep,
    )


def sharded_model_ctx(n_spatial: int, *, overlap: bool = True):
    """Context manager factory installing the sharded conv machinery.

    Always installs the seam-routed sharded pad (non-3x3 / strided layers);
    with ``overlap=True`` (default) additionally routes every 3x3/stride-1
    conv through :mod:`dlwp_cs_tpu.parallel.overlap` — the band ring-fix
    formulation whose interior conv carries no data dependence on the halo
    collectives, so XLA can overlap seam traffic with MXU work.
    """
    pad_impl = make_sharded_pad(n_spatial)
    if not overlap:
        return lambda: use_pad_impl(pad_impl)
    from dlwp_cs_tpu.ops.conv import use_conv3x3_impl
    from dlwp_cs_tpu.parallel.overlap import make_sharded_conv3x3

    conv_impl = make_sharded_conv3x3(n_spatial)

    @contextlib.contextmanager
    def ctx():
        with use_pad_impl(pad_impl), use_conv3x3_impl(conv_impl):
            yield

    return ctx


def make_spatial_train_step(
    apply_fn, optimizer, loss_fn, mesh: Mesh, *, jit: bool = True,
    overlap: bool = True,
):
    """shard_map train step: batch over 'data', face rows over 'spatial'.

    ``loss_fn`` must be an unweighted elementwise-mean loss (mse/mae); the
    local means are ``pmean``-combined, which is exact because every shard
    holds the same number of elements.  ``overlap`` selects the
    overlap-friendly band conv (see :func:`sharded_model_ctx`).
    """
    n_spatial = mesh.shape[SPATIAL_AXIS]
    axes = (DATA_AXIS, SPATIAL_AXIS)
    model_ctx = sharded_model_ctx(n_spatial, overlap=overlap)

    def local_step(state: TrainState, inputs, targets):
        def loss_of(params):
            with model_ctx():
                pred = apply_fn(params, inputs)
            return loss_fn(pred, targets)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        loss = lax.pmean(loss, axes)
        grads = lax.pmean(grads, axes)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }

    batch_spec = P(DATA_AXIS, None, SPATIAL_AXIS, None, None)
    state_spec = P()
    stepped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, batch_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    if not jit:
        return stepped
    return jax.jit(stepped, donate_argnums=(0,))


def make_spatial_apply(apply_fn, mesh: Mesh, *, jit: bool = True,
                       overlap: bool = True):
    """Sharded forward pass: ``f(params, inputs) -> outputs`` under shard_map.

    Used by the sharded rollout and by the sharding-equivalence tests.
    """
    n_spatial = mesh.shape[SPATIAL_AXIS]
    model_ctx = sharded_model_ctx(n_spatial, overlap=overlap)

    def local_apply(params, inputs):
        with model_ctx():
            return apply_fn(params, inputs)

    spec = P(DATA_AXIS, None, SPATIAL_AXIS, None, None)
    fn = jax.shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(P(), spec),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn) if jit else fn
