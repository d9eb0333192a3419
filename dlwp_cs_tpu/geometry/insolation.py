"""Analytic top-of-atmosphere solar irradiance, fully traceable JAX.

Capability parity with the reference's ``DLWP/util.py::insolation(dates, lat,
lon)`` (the solar-forcing input channel), but designed TPU-first: the time
argument is a float (days since the J2000 epoch) instead of a datetime array,
so the whole computation lives *inside* the jitted train step and the
``lax.scan`` rollout — the reference recomputes insolation on the host with
numpy between every autoregressive step (SURVEY.md §3.3), a host round-trip
this design removes entirely.

Formulation: Spencer (1971) Fourier series for solar declination, equation of
time and the Sun–Earth distance factor, then the standard zenith-angle
formula.  Accuracy is a fraction of a percent — more than enough for a
*learned-forcing* channel (the network standardizes it anyway), and the same
class of approximation the reference uses.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "insolation",
    "INSOLATION_PERIOD_DAYS",
    "J2000_EPOCH",
    "SOLAR_CONSTANT",
]

# Mean total solar irradiance, W/m^2.
SOLAR_CONSTANT = 1361.0

# Days-since-epoch convention: 2000-01-01 00:00 UTC.
J2000_EPOCH = "2000-01-01T00:00:00Z"

# Spencer's day angle wants 2*pi*(DOY-1)/365.25; mod(epoch_days, 365.25)
# is 0-based and supplies exactly DOY-1 directly (0.0 on Jan 1) — do NOT
# 'fix' it by adding 1.
_DAYS_PER_YEAR = 365.25

# The formula is exactly periodic in 1461 days (= 4 * 365.25, the least
# common period of its mod-365.25 and mod-1 reductions).  Reduce epoch-day
# arguments mod this ON THE HOST IN FLOAT64 before feeding jitted code:
# present-day epoch days (~9700) carry an ~84 s float32 ULP that quantizes
# the hour angle, while reduced values (< 1461) resolve ~10 s — and in-graph
# clock accumulation on reduced values stays at that resolution.
INSOLATION_PERIOD_DAYS = 1461.0


def _spencer_terms(day_angle, xp):
    """Declination (rad), equation of time (rad), distance factor (a/r)^2."""
    g = day_angle
    c1, s1 = xp.cos(g), xp.sin(g)
    c2, s2 = xp.cos(2 * g), xp.sin(2 * g)
    c3, s3 = xp.cos(3 * g), xp.sin(3 * g)
    decl = (
        0.006918
        - 0.399912 * c1
        + 0.070257 * s1
        - 0.006758 * c2
        + 0.000907 * s2
        - 0.002697 * c3
        + 0.001480 * s3
    )
    # Equation of time in radians of hour angle.
    eot = 0.000075 + 0.001868 * c1 - 0.032077 * s1 - 0.014615 * c2 - 0.040849 * s2
    dist = (
        1.000110
        + 0.034221 * c1
        + 0.001280 * s1
        + 0.000719 * c2
        + 0.000077 * s2
    )
    return decl, eot, dist


def insolation(days_since_epoch, lat, lon, *, s0: float = SOLAR_CONSTANT, xp=jnp):
    """TOA downward solar irradiance in W/m^2.

    Args:
      days_since_epoch: float scalar or array, days since 2000-01-01 00:00 UTC
        (fractional part encodes UTC time of day). Broadcasts against lat/lon
        from the left, i.e. pass shape ``(T, 1, 1, 1)`` with lat ``(6, n, n)``
        to get ``(T, 6, n, n)``.
      lat, lon: radians; lon east-positive.
      s0: solar constant override.
      xp: array namespace — ``jnp`` (default, traceable) or ``numpy`` for the
        host-side data pipeline, which must never touch an accelerator.  Both
        paths share this one formula so train-time and rollout-time forcing
        cannot diverge.

    Returns ``s0 * (a/r)^2 * max(cos(zenith), 0)``, elementwise.
    """
    d = xp.asarray(days_since_epoch)
    lat = xp.asarray(lat)
    lon = xp.asarray(lon)
    # 0-based day-of-year (= DOY-1, what the day angle wants) and UTC
    # fraction-of-day.
    doy = xp.mod(d, _DAYS_PER_YEAR)
    frac = xp.mod(d, 1.0)
    day_angle = 2.0 * xp.pi * doy / _DAYS_PER_YEAR
    decl, eot, dist = _spencer_terms(day_angle, xp)
    # Hour angle: solar noon at lon 0 is 12 UTC; eot shifts apparent time.
    hour_angle = 2.0 * xp.pi * (frac - 0.5) + lon + eot
    cos_zen = xp.sin(lat) * xp.sin(decl) + xp.cos(lat) * xp.cos(decl) * xp.cos(
        hour_angle
    )
    return s0 * dist * xp.maximum(cos_zen, 0.0)
