"""Channel packing conventions: the contract between data pipeline, model
and rollout.

The reference folds (time_step, varlev) into the channel dimension inside its
generators (``SeriesDataGenerator`` — SURVEY.md §2 row 9); the exact ordering
is an implicit contract between generator and ``TimeSeriesEstimator``.  Here
it is one explicit module used by both sides.

Canonical input channel layout (channels-last ``(B, 6, n, n, C)``)::

    [ t_0 vars... | t_1 vars... | ... | insol(t_0..t_{Tin-1}) | constants ]

i.e. prognostic fields time-major-outer (channel = t * C_var + c), then one
insolation channel per input time, then static constant channels.  Output
channels are the prognostic fields of the predicted times, time-major-outer.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "advance_window",
    "fold_time",
    "make_input_insolation",
    "pack_inputs",
    "unfold_time",
]


def fold_time(x, xp=jnp):
    """``(B, T, 6, n, n, C) -> (B, 6, n, n, T*C)`` (time-major-outer).

    ``xp``: array namespace — ``jnp`` (default) or ``numpy`` for the host
    data pipeline, which must never touch an accelerator.  ONE definition of
    the layout-defining transform for both sides (the contract this module
    exists to centralize)."""
    t = x.shape[1]
    x = xp.moveaxis(x, 1, -2)  # (B, 6, n, n, T, C)
    return x.reshape(x.shape[:-2] + (t * x.shape[-1],))


def unfold_time(x, t: int):
    """Inverse of :func:`fold_time`: ``(B, 6, n, n, T*C) -> (B, T, 6, n, n, C)``."""
    c = x.shape[-1] // t
    if t * c != x.shape[-1]:
        raise ValueError(f"channels {x.shape[-1]} not divisible by time steps {t}")
    x = x.reshape(x.shape[:-1] + (t, c))
    return jnp.moveaxis(x, -2, 1)


def pack_inputs(window, insol=None, constants=None):
    """Assemble the model input tensor.

    Args:
      window: ``(B, T_in, 6, n, n, C_var)`` normalized prognostic fields.
      insol: optional ``(B, T_in, 6, n, n)`` or ``(T_in, 6, n, n)`` normalized
        insolation (broadcast over batch if unbatched).
      constants: optional ``(6, n, n, K)`` normalized static fields.

    Returns ``(B, 6, n, n, T_in*C_var [+ T_in] [+ K])``.
    """
    parts = [fold_time(window)]
    b = window.shape[0]
    if insol is not None:
        if insol.ndim == 4:
            insol = jnp.broadcast_to(insol[None], (b,) + insol.shape)
        parts.append(fold_time(insol[..., None]))
    if constants is not None:
        const = jnp.broadcast_to(
            constants[None], (b,) + constants.shape
        )
        parts.append(const)
    return jnp.concatenate(parts, axis=-1)


def make_input_insolation(data_cfg, lat, lon, insol_mean=0.0, insol_std=1.0):
    """Closure: normalized insolation channels for the input window ENDING
    at ``t_days`` (offsets ``-(T_in-1)..0`` steps), or ``None`` when
    ``data_cfg.add_insolation`` is off.

    ``t_days`` may be a scalar (shared init time) or a ``(B,)`` vector of
    per-batch-member times; the channels are ``(T_in, 6, n, n)`` or
    ``(B, T_in, 6, n, n)`` respectively (both accepted by
    :func:`pack_inputs`).  ONE definition shared by the autoregressive
    training loss (:mod:`dlwp_cs_tpu.train.sequence`) and the inference
    rollout (:mod:`dlwp_cs_tpu.rollout.estimator`) so the two forcing
    clocks can never drift apart — the train/inference consistency both
    modules promise.
    """
    from dlwp_cs_tpu.geometry.insolation import insolation

    t_in = data_cfg.input_time_steps
    dt_days = data_cfg.step_hours / 24.0
    lat = jnp.asarray(lat)
    lon = jnp.asarray(lon)

    def input_insolation(t_days):
        if not data_cfg.add_insolation:
            return None
        offsets = (jnp.arange(t_in) - (t_in - 1)) * dt_days
        if t_days.ndim == 0:
            times = t_days + offsets  # (T_in,)
        else:
            times = t_days[:, None] + offsets[None, :]  # (B, T_in)
        ins = insolation(times[..., None, None, None], lat, lon)
        return (ins - insol_mean) / insol_std

    return input_insolation


def advance_window(window, out, t_out: int):
    """Autoregressive output->input rewiring shared by train and inference.

    Unfolds the model output ``(B, 6, n, n, T_out*C)`` into ``T_out`` new
    time steps, appends them to the input ``window`` and keeps the last
    ``T_in`` steps.  Returns ``(new_window, out_window)``.
    """
    t_in = window.shape[1]
    out_window = unfold_time(out, t_out)  # (B, T_out, 6, n, n, C)
    new_window = jnp.concatenate([window, out_window], axis=1)[:, -t_in:]
    return new_window, out_window
