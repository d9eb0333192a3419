"""Ensemble forecasting: perturbed-IC ensembles as ONE device dispatch.

The reference line of work runs large lagged/perturbed ensembles of the
DLWP-CS model for sub-seasonal forecasts (Weyn et al. 2021, "Sub-seasonal
forecasting with a large ensemble of deep-learning weather prediction
models"), but the reference codebase itself has no ensemble machinery — the
user loops ``TimeSeriesEstimator.predict`` per member on the host
(``DLWP/model/extensions.py``, SURVEY.md §3.3).

TPU-first design: members fold into the BATCH axis of the existing
single-scan rollout (:func:`dlwp_cs_tpu.rollout.make_rollout_fn`), so an
M-member ensemble is one ``lax.scan`` over one ``(B*M)``-batch model call —
larger batch = better MXU fill (the rollout is nearly batch-invariant up to
the chip's capacity, PERF.md serving rows), and mean/spread reduce on device
before anything is fetched.  Initial-condition perturbations are centered
Gaussian noise in NORMALIZED units with optional antithetic (+/-) pairing so
the ensemble-mean IC equals the control analysis exactly; member 0 is always
the unperturbed control.

Verification counterparts (CRPS, spread-error, rank histogram) live in
:mod:`dlwp_cs_tpu.verify.ensemble`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.geometry.insolation import INSOLATION_PERIOD_DAYS
from dlwp_cs_tpu.models.config import DataConfig
from dlwp_cs_tpu.rollout.estimator import make_rollout_fn

__all__ = [
    "EnsembleForecast",
    "EnsembleForecaster",
    "ic_perturbations",
    "make_ensemble_rollout",
    "make_lagged_rollout",
    "make_multimodel_rollout",
    "stack_params",
]


class EnsembleForecast(NamedTuple):
    """Ensemble rollout result.

    ``mean`` / ``spread``: ``(B, steps * T_out, 6, n, n, C_var)`` ensemble
    mean and standard deviation (ddof=1) in the rollout's (normalized)
    units.  ``members``: the full ``(B, M, steps * T_out, 6, n, n, C_var)``
    stack when requested (``keep_members=True``), else ``None``.
    """

    mean: jnp.ndarray
    spread: jnp.ndarray
    lead_hours: jnp.ndarray
    members: jnp.ndarray | None = None
    init_times: Any = None
    variables: tuple[str, ...] | None = None


def ic_perturbations(key, window_shape, members: int, *,
                     antithetic: bool = True, dtype=jnp.float32):
    """Unit-amplitude IC perturbations ``(B, members, *window_shape[1:])``.

    Member 0 is zero (the control).  With ``antithetic=True`` the remaining
    members come in exact ``(+eps, -eps)`` pairs (the last is unpaired when
    ``members - 1`` is odd), so for odd ``members`` the perturbation mean
    over the ensemble axis is zero (up to f32 reduction rounding).
    """
    if members < 1:
        raise ValueError(f"members must be >= 1, got {members}")
    b = window_shape[0]
    rest = tuple(window_shape[1:])
    npert = members - 1
    if npert == 0:
        return jnp.zeros((b, 1) + rest, dtype)
    if antithetic:
        nsamp = (npert + 1) // 2
        eps = jax.random.normal(key, (b, nsamp) + rest, dtype)
        pert = jnp.concatenate([eps, -eps], axis=1)[:, :npert]
    else:
        pert = jax.random.normal(key, (b, npert) + rest, dtype)
    return jnp.concatenate([jnp.zeros((b, 1) + rest, dtype), pert], axis=1)


def make_ensemble_rollout(
    apply_fn,
    data_cfg: DataConfig,
    *,
    lat,
    lon,
    constants=None,
    insol_mean: float = 0.0,
    insol_std: float = 1.0,
    steps: int,
    members: int,
    antithetic: bool = True,
    keep_members: bool = False,
    unroll: int = 1,
):
    """Build a jittable ``ensemble(params, window, t0_days, key, amplitude)``.

    ``window``: ``(B, T_in, 6, n, n, C_var)`` normalized control analysis.
    ``amplitude``: scalar or per-channel ``(C_var,)`` perturbation standard
    deviation in normalized units (traced, so sweeping it does not
    recompile).  Returns :class:`EnsembleForecast`; ``mean``/``spread``
    reduce over members on device.
    """
    base = make_rollout_fn(
        apply_fn,
        data_cfg,
        lat=lat,
        lon=lon,
        constants=constants,
        insol_mean=insol_mean,
        insol_std=insol_std,
        steps=steps,
        unroll=unroll,
    )

    def ensemble(params, window, t0_days, key, amplitude) -> EnsembleForecast:
        if window.ndim != 6:
            raise ValueError(
                f"window must be (B, T_in, 6, n, n, C), got {window.shape}"
            )
        b = window.shape[0]
        amplitude = jnp.asarray(amplitude, window.dtype)
        pert = ic_perturbations(
            key, window.shape, members, antithetic=antithetic,
            dtype=window.dtype,
        )
        stack = window[:, None] + amplitude * pert  # (B, M, T_in, 6, n, n, C)
        flat = stack.reshape((b * members,) + window.shape[1:])
        t0 = jnp.asarray(t0_days, jnp.float32)
        if t0.ndim == 1:
            t0 = jnp.repeat(t0, members)
        fc = base(params, flat, t0)
        fields = fc.fields.reshape((b, members) + fc.fields.shape[1:])
        mean = jnp.mean(fields, axis=1)
        if members > 1:
            spread = jnp.std(fields, axis=1, ddof=1)
        else:
            spread = jnp.zeros_like(mean)
        return EnsembleForecast(
            mean=mean,
            spread=spread,
            lead_hours=fc.lead_hours,
            members=fields if keep_members else None,
        )

    return ensemble


def stack_params(params_list):
    """Stack K same-architecture param trees leaf-wise for
    :func:`make_multimodel_rollout` (leading axis = model index)."""
    if not params_list:
        raise ValueError("need at least one param tree")
    first = jax.tree.structure(params_list[0])
    for p in params_list[1:]:
        if jax.tree.structure(p) != first:
            raise ValueError(
                "param trees differ in structure — multi-model ensembles "
                "need one architecture"
            )
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *params_list)


def make_multimodel_rollout(
    apply_fn,
    data_cfg: DataConfig,
    *,
    lat,
    lon,
    constants=None,
    insol_mean: float = 0.0,
    insol_std: float = 1.0,
    steps: int,
    keep_members: bool = False,
    unroll: int = 1,
):
    """Build a jittable multi-model ensemble rollout.

    The reference line's 2021 ensemble combined separately trained models
    by looping checkpoints on the host; here K same-architecture models
    (e.g. different training seeds) run as ONE device dispatch —
    ``jax.vmap`` over a stacked param tree (:func:`stack_params`), which
    XLA folds into the conv batch just like member folding.

    Returns ``multi(params_stack, window, t0_days) -> EnsembleForecast``
    with the member axis = model index.  All models must share the data
    config (the normalization/stats contract is the caller's: stack only
    models trained on the same store statistics).
    """
    base = make_rollout_fn(
        apply_fn,
        data_cfg,
        lat=lat,
        lon=lon,
        constants=constants,
        insol_mean=insol_mean,
        insol_std=insol_std,
        steps=steps,
        unroll=unroll,
    )

    def multi(params_stack, window, t0_days) -> EnsembleForecast:
        fields = jax.vmap(
            lambda p: base(p, window, t0_days).fields
        )(params_stack)  # (K, B, L, 6, n, n, C)
        members = jnp.moveaxis(fields, 0, 1)  # (B, K, L, ...)
        k = members.shape[1]
        mean = jnp.mean(members, axis=1)
        if k > 1:
            spread = jnp.std(members, axis=1, ddof=1)
        else:
            spread = jnp.zeros_like(mean)
        t_out = data_cfg.output_time_steps
        lead = (jnp.arange(steps * t_out) + 1) * data_cfg.step_hours
        return EnsembleForecast(
            mean=mean,
            spread=spread,
            lead_hours=lead,
            members=members if keep_members else None,
        )

    return multi


def make_lagged_rollout(
    apply_fn,
    data_cfg: DataConfig,
    *,
    lat,
    lon,
    constants=None,
    insol_mean: float = 0.0,
    insol_std: float = 1.0,
    steps: int,
    lags,
    keep_members: bool = False,
    unroll: int = 1,
):
    """Build a jittable lagged-average-forecast (LAF) ensemble rollout.

    Member ``m`` is initialized ``lags[m]`` model steps (of ``step_hours``)
    EARLIER than the control time ``t0`` and rolled far enough that every
    member's outputs cover the control's lead times; the members are then
    valid-time aligned on device, so ``mean``/``spread`` are proper
    fixed-valid-time ensemble statistics.  This is the lagged-ensemble
    design of the reference line's sub-seasonal work (Weyn et al. 2021),
    which the reference could only assemble by hand across host-loop runs.

    Returns ``lagged(params, windows, t0_days) -> EnsembleForecast`` where
    ``windows`` is ``(B, M, T_in, 6, n, n, C)`` — member ``m``'s input
    window ENDS at ``t0 - lags[m] * dt`` — and ``t0_days`` is the control
    init (scalar or ``(B,)``).  ``lags`` must start at 0 (the control) and
    be non-negative.
    """
    lags = tuple(int(g) for g in lags)
    if not lags or lags[0] != 0 or any(g < 0 for g in lags):
        raise ValueError(
            f"lags must start at 0 (the control) and be non-negative, got "
            f"{lags}"
        )
    t_out = data_cfg.output_time_steps
    n_lead = steps * t_out
    extra_calls = -(-max(lags) // t_out)  # ceil: cover the latest lag
    base = make_rollout_fn(
        apply_fn,
        data_cfg,
        lat=lat,
        lon=lon,
        constants=constants,
        insol_mean=insol_mean,
        insol_std=insol_std,
        steps=steps + extra_calls,
        unroll=unroll,
    )
    dt_days = data_cfg.step_hours / 24.0
    members = len(lags)

    def lagged(params, windows, t0_days) -> EnsembleForecast:
        if windows.ndim != 7 or windows.shape[1] != members:
            raise ValueError(
                f"windows must be (B, {members}, T_in, 6, n, n, C), got "
                f"{windows.shape}"
            )
        b = windows.shape[0]
        flat = windows.reshape((b * members,) + windows.shape[2:])
        t0 = jnp.asarray(t0_days, jnp.float32)
        lag_days = jnp.asarray(lags, jnp.float32) * dt_days
        if t0.ndim == 0:
            t0_flat = jnp.tile(t0 - lag_days, b)
        else:
            t0_flat = (t0[:, None] - lag_days[None, :]).reshape(-1)
        fc = base(params, flat, t0_flat)
        fields = fc.fields.reshape((b, members) + fc.fields.shape[1:])
        # member m's lead j is valid at t0 - lags[m]*dt + (j+1)*dt: the
        # window [lags[m], lags[m] + n_lead) aligns it to the control
        # leads — lags are static, so these are constant-offset slices
        aligned = jnp.stack(
            [fields[:, m, g : g + n_lead] for m, g in enumerate(lags)],
            axis=1,
        )
        mean = jnp.mean(aligned, axis=1)
        if members > 1:
            spread = jnp.std(aligned, axis=1, ddof=1)
        else:
            spread = jnp.zeros_like(mean)
        lead = (jnp.arange(n_lead) + 1) * data_cfg.step_hours
        return EnsembleForecast(
            mean=mean,
            spread=spread,
            lead_hours=lead,
            members=aligned if keep_members else None,
        )

    return lagged


@dataclass
class EnsembleForecaster:
    """Object wrapper mirroring :class:`~dlwp_cs_tpu.rollout.estimator
    .TimeSeriesEstimator` for ensembles; jitted rollouts cached per
    ``(steps, members, ...)`` configuration."""

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
        members: int,
        key=None,
        amplitude=0.05,
        antithetic: bool = True,
        keep_members: bool = False,
        jit: bool = True,
        unroll: int = 1,
    ) -> EnsembleForecast:
        import numpy as np

        cache = self.__dict__.setdefault("_cache", {})
        cfg = (steps, members, antithetic, keep_members, unroll, jit)
        fn = cache.get(cfg)
        if fn is None:
            fn = make_ensemble_rollout(
                self.apply_fn,
                self.data_cfg,
                lat=self.lat,
                lon=self.lon,
                constants=self.constants,
                insol_mean=self.insol_mean,
                insol_std=self.insol_std,
                steps=steps,
                members=members,
                antithetic=antithetic,
                keep_members=keep_members,
                unroll=unroll,
            )
            if jit:
                fn = jax.jit(fn)
            cache[cfg] = fn
        if key is None:
            key = jax.random.PRNGKey(0)
        # float64 periodic reduction before the in-graph f32 cast, as in
        # TimeSeriesEstimator.predict (insolation clock precision).
        t0_red = np.mod(
            np.asarray(t0_days, np.float64), INSOLATION_PERIOD_DAYS
        ).astype(np.float32)
        fc = fn(
            self.params, window, t0_red if t0_red.ndim else float(t0_red),
            key, amplitude,
        )
        return fc._replace(
            init_times=t0_days, variables=tuple(self.data_cfg.variables)
        )
