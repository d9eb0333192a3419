"""Probabilistic verification for ensemble forecasts.

The reference verifies deterministic skill only (``DLWP/verify.py`` —
RMSE/ACC vs persistence/climatology; SURVEY.md §2 row 17); its ensemble
papers (Weyn et al. 2021) scored CRPS/spread offline.  This module provides
the standard probabilistic scores for
:class:`dlwp_cs_tpu.rollout.ensemble.EnsembleForecast` outputs, all
jittable/batched:

* :func:`crps_ensemble` — continuous ranked probability score, fair (PWM /
  Ferro 2014) or standard estimator, via the O(M log M) sorted Gini form
  rather than O(M^2) pairwise differences.
* :func:`spread_error` — RMSE of the ensemble mean vs mean ensemble spread
  per lead time (the spread-skill diagnostic; a reliable M-member ensemble
  has RMSE ~= spread * sqrt((M+1)/M)).
* :func:`rank_histogram` — verification-rank (Talagrand) histogram counts.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["crps_ensemble", "rank_histogram", "spread_error"]


def _move_members_last(members, truth, member_axis):
    members = jnp.moveaxis(members, member_axis, -1)
    if truth.shape != members.shape[:-1]:
        raise ValueError(
            f"truth shape {truth.shape} must equal members shape without "
            f"the member axis {members.shape[:-1]}"
        )
    return members, truth


def crps_ensemble(members, truth, *, member_axis: int = 1,
                  fair: bool = True):
    """Pointwise CRPS of an M-member ensemble against scalar truth.

    ``members``: ensemble stack with the member axis at ``member_axis``
    (default 1 — the :class:`EnsembleForecast.members` layout
    ``(B, M, L, 6, n, n, C)``); ``truth``: same shape without that axis.
    Returns CRPS per point (truth's shape); reduce as desired.

    Estimator: ``E|X - y| - c * sum_{i,j} |x_i - x_j|`` with
    ``c = 1/(2 M (M-1))`` for the fair (unbiased, Ferro 2014) version or
    ``1/(2 M^2)`` for the standard one.  The pair sum uses the sorted Gini
    identity ``sum_{i,j}|x_i - x_j| = 2 * sum_i (2i - M + 1) x_(i)``
    (ascending order, i zero-based) — O(M log M), no M x M intermediate.
    """
    members, truth = _move_members_last(members, truth, member_axis)
    m = members.shape[-1]
    mae = jnp.mean(jnp.abs(members - truth[..., None]), axis=-1)
    if m == 1:
        return mae
    srt = jnp.sort(members, axis=-1)
    coef = 2.0 * jnp.arange(m, dtype=srt.dtype) - (m - 1)
    gini = 2.0 * jnp.sum(coef * srt, axis=-1)  # sum_{i,j} |x_i - x_j|
    denom = 2.0 * m * (m - 1) if fair else 2.0 * m * m
    return mae - gini / denom


def spread_error(members, truth, *, member_axis: int = 1, lead_axis=None):
    """Spread-skill pair: ``(rmse_of_mean, mean_spread)``.

    Reduces over every axis except ``lead_axis`` (default: the axis right
    after the member axis, matching ``EnsembleForecast.members``'s lead
    dimension), returning two ``(n_leads,)`` curves: RMSE of the ensemble
    mean and the quadratic-mean ensemble spread (ddof=1).  For a reliable
    ensemble ``rmse ~= spread * sqrt((M+1)/M)``.
    """
    members, truth = _move_members_last(members, truth, member_axis)
    if members.shape[-1] < 2:
        raise ValueError(
            "spread_error needs >= 2 members (ddof=1 spread is undefined "
            "for a single member)"
        )
    if lead_axis is None:
        # after the member axis is moved last, the axis that followed it
        # keeps the member axis's old index
        lead_axis = member_axis % members.ndim
        if lead_axis >= members.ndim - 1:
            raise ValueError(
                "no axis follows the member axis; pass lead_axis explicitly"
            )
    mean = jnp.mean(members, axis=-1)
    var = jnp.var(members, axis=-1, ddof=1)
    reduce_axes = tuple(a for a in range(mean.ndim) if a != lead_axis)
    rmse = jnp.sqrt(jnp.mean(jnp.square(mean - truth), axis=reduce_axes))
    spread = jnp.sqrt(jnp.mean(var, axis=reduce_axes))
    return rmse, spread


def rank_histogram(members, truth, *, member_axis: int = 1):
    """Verification-rank histogram counts, shape ``(M + 1,)``.

    The rank of truth within each sorted M-member ensemble (0 = below every
    member, M = above every member), counted over all points.  A reliable
    ensemble is flat; a U shape means under-dispersion.  A member exactly
    equal to truth counts as *above* it (strict ``<``), lowering the rank;
    exact ties are measure-zero for continuous fields.
    """
    members, truth = _move_members_last(members, truth, member_axis)
    m = members.shape[-1]
    ranks = jnp.sum(members < truth[..., None], axis=-1)
    return jnp.bincount(ranks.reshape(-1), length=m + 1)
