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
    SPATIAL_X_AXIS,
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


def sharded_model_ctx(
    n_spatial: int,
    *,
    overlap: bool = True,
    n_spatial_x: int = 1,
    band_impl: str = "ppermute",
    band_conv: str = "ringfix",
):
    """Context manager factory installing the sharded conv machinery.

    With ``n_spatial_x == 1`` (row bands): installs the seam-routed 1-D
    sharded pad; ``overlap=True`` (default) additionally routes every
    3x3/stride-1 conv through :mod:`dlwp_cs_tpu.parallel.overlap` — the band
    ring-fix formulation whose interior conv carries no data dependence on
    the halo collectives, so XLA can overlap seam traffic with MXU work.

    With ``n_spatial_x > 1`` (2-D row x column tiling): installs the 2-D
    exchange of :mod:`dlwp_cs_tpu.parallel.halo2d`; every conv runs
    pad-then-VALID on the tile (the 1-D overlap conv formulation is
    band-specific and does not apply).

    ``band_impl`` selects the band-row transport for the 1-D path:
    ``'ppermute'`` (default) or ``'rdma'``/``'rdma_interpret'`` (the
    in-kernel Pallas async-remote-copy exchange, :mod:`parallel.rdma_halo`).

    ``band_conv`` selects the 1-D band conv formulation (requires
    ``overlap=True``): ``'ringfix'`` (default — XLA band ring-fix, seam
    traffic overlappable with the interior conv) or
    ``'pallas'``/``'pallas_interpret'`` — the shard-local fused VMEM kernel
    (:mod:`parallel.pallas_band`) consuming the exchanged halo strips:
    fewer per-conv XLA ops, but every MXU flop then depends on the seam
    collectives (no overlap).  Which wins is a real-multi-chip measurement
    this 1-chip environment cannot take; both are equivalence-pinned.
    """
    if n_spatial_x > 1:
        from dlwp_cs_tpu.parallel.halo2d import make_sharded_pad_2d

        if band_impl != "ppermute":
            # the band-row transport is a 1-D concept; accepting and
            # ignoring e.g. 'rdma' here would silently measure the wrong
            # exchange
            raise ValueError(
                f"band_impl {band_impl!r} does not apply to the 2-D "
                "row x column tiling (its exchange is parallel.halo2d); "
                "leave it at the default 'ppermute'"
            )
        pad2d = make_sharded_pad_2d(n_spatial, n_spatial_x)
        if band_conv in ("pallas", "pallas_interpret"):
            # 2-D fused tile conv (parallel.pallas_tile): every supported
            # 3x3 through the VMEM kernel on exchanged halo pieces; other
            # layers keep pad-then-VALID via the installed 2-D pad.
            from dlwp_cs_tpu.ops.conv import use_conv3x3_impl
            from dlwp_cs_tpu.parallel.pallas_tile import (
                make_tile_pallas_conv3x3,
            )

            tile_conv = make_tile_pallas_conv3x3(
                n_spatial, n_spatial_x,
                interpret=band_conv == "pallas_interpret",
            )

            @contextlib.contextmanager
            def ctx2d():
                with use_pad_impl(pad2d), use_conv3x3_impl(tile_conv):
                    yield

            return ctx2d
        if band_conv != "ringfix":
            # same strictness as the 1-D branch: a typo or a band-only
            # mode ('overlap') must not silently measure pad-then-VALID
            raise ValueError(
                f"band_conv {band_conv!r} is not available on the 2-D "
                "row x column tiling; want 'ringfix' (pad-then-VALID) | "
                "'pallas' | 'pallas_interpret' (fused tile kernel)"
            )
        return lambda: use_pad_impl(pad2d)
    from dlwp_cs_tpu.parallel.halo import use_band_exchange

    pad_impl = make_sharded_pad(n_spatial)
    if not overlap:
        if band_conv != "ringfix":
            # same silent-config hazard as the 2-D branch: without the
            # overlap conv machinery no band conv is installed, so a
            # non-default band_conv would be accepted and ignored
            raise ValueError(
                f"band_conv {band_conv!r} requires overlap=True (with "
                "overlap=False every conv runs pad-then-VALID)"
            )

        @contextlib.contextmanager
        def pad_ctx():
            with use_band_exchange(band_impl), use_pad_impl(pad_impl):
                yield

        return pad_ctx
    from dlwp_cs_tpu.ops.conv import use_conv3x3_impl

    if band_conv in ("pallas", "pallas_interpret"):
        from dlwp_cs_tpu.parallel.pallas_band import make_sharded_pallas_conv3x3

        conv_impl = make_sharded_pallas_conv3x3(
            n_spatial, interpret=band_conv == "pallas_interpret"
        )
    elif band_conv in ("overlap", "overlap_interpret"):
        # M6: the fused band kernel whose band-row halo rides in-kernel
        # async remote copies, interior taps overlapping the transfers
        # (parallel.overlap_band).
        from dlwp_cs_tpu.parallel.overlap_band import make_overlap_conv3x3

        conv_impl = make_overlap_conv3x3(
            n_spatial, interpret=band_conv == "overlap_interpret"
        )
    elif band_conv == "ringfix":
        from dlwp_cs_tpu.parallel.overlap import make_sharded_conv3x3

        conv_impl = make_sharded_conv3x3(n_spatial)
    else:
        raise ValueError(
            f"unknown band_conv {band_conv!r}; want 'ringfix' | 'pallas' | "
            "'pallas_interpret' | 'overlap' | 'overlap_interpret'"
        )

    @contextlib.contextmanager
    def ctx():
        with use_band_exchange(band_impl), use_pad_impl(pad_impl), \
                use_conv3x3_impl(conv_impl):
            yield

    return ctx


def make_spatial_train_step(
    apply_fn, optimizer, loss_fn, mesh: Mesh, *, jit: bool = True,
    overlap: bool = True, band_impl: str = "ppermute",
    band_conv: str = "ringfix",
):
    """shard_map train step: batch over 'data', face rows over 'spatial'.

    ``loss_fn`` is either an unweighted elementwise-mean loss (mse/mae),
    whose local means are ``pmean``-combined (exact: every shard holds the
    same number of elements), or a loss exposing the ``local_terms``
    protocol (:class:`dlwp_cs_tpu.ops.losses.AreaWeightedLoss`): each shard
    contributes ``(sum(w * err), sum(w))`` and both are ``psum``-combined
    before dividing — the exact global weighted mean, so area-weighted
    training works at the spatially-decomposed scale tier (VERDICT r2 weak
    #6).  ``overlap`` selects the overlap-friendly band conv (see
    :func:`sharded_model_ctx`).
    """
    n_spatial = mesh.shape[SPATIAL_AXIS]
    n_spatial_x = mesh.shape.get(SPATIAL_X_AXIS, 1)
    axes = tuple(
        a
        for a in (DATA_AXIS, SPATIAL_AXIS, SPATIAL_X_AXIS)
        if a in mesh.shape
    )
    model_ctx = sharded_model_ctx(
        n_spatial, overlap=overlap, n_spatial_x=n_spatial_x,
        band_impl=band_impl, band_conv=band_conv,
    )
    weighted = hasattr(loss_fn, "local_terms")

    def local_step(state: TrainState, inputs, targets):
        if weighted:
            # Differentiate the LOCAL weighted error sum only (collectives
            # stay outside the differentiated function — no reliance on
            # psum-transpose semantics); the weight total carries no
            # parameter dependence, so the global gradient is exactly
            # psum(d wsum)/psum(wtot).
            def wsum_of(params):
                with model_ctx():
                    pred = apply_fn(params, inputs)
                return loss_fn.local_terms(
                    pred,
                    targets,
                    spatial_axis=SPATIAL_AXIS,
                    spatial_x_axis=SPATIAL_X_AXIS if n_spatial_x > 1 else None,
                )

            (wsum, wtot), grads = jax.value_and_grad(wsum_of, has_aux=True)(
                state.params
            )
            wtot_g = lax.psum(wtot, axes)
            loss = lax.psum(wsum, axes) / wtot_g
            grads = jax.tree.map(lambda g: lax.psum(g, axes) / wtot_g, grads)
        else:

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

    batch_spec = P(
        DATA_AXIS,
        None,
        SPATIAL_AXIS,
        SPATIAL_X_AXIS if n_spatial_x > 1 else None,
        None,
    )
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
                       overlap: bool = True, band_impl: str = "ppermute",
                       band_conv: str = "ringfix"):
    """Sharded forward pass: ``f(params, inputs) -> outputs`` under shard_map.

    Used by the sharded rollout and by the sharding-equivalence tests.
    """
    n_spatial = mesh.shape[SPATIAL_AXIS]
    n_spatial_x = mesh.shape.get(SPATIAL_X_AXIS, 1)
    model_ctx = sharded_model_ctx(
        n_spatial, overlap=overlap, n_spatial_x=n_spatial_x,
        band_impl=band_impl, band_conv=band_conv,
    )

    def local_apply(params, inputs):
        with model_ctx():
            return apply_fn(params, inputs)

    spec = P(
        DATA_AXIS,
        None,
        SPATIAL_AXIS,
        SPATIAL_X_AXIS if n_spatial_x > 1 else None,
        None,
    )
    fn = jax.shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(P(), spec),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn) if jit else fn
