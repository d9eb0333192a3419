"""Forecast/truth alignment helpers.

Capability parity with the reference's ``predictors_to_time_series`` and the
forecast-metadata plumbing of ``DLWP/verify.py`` (SURVEY.md §2 row 17): given
a predictor store (a flat time series) and a set of forecasts ``(B, L, ...)``
with initialization times and lead hours, produce the aligned truth tensor,
initialization fields (for persistence) and valid-month indices (for monthly
climatology) in one pass.
"""

from __future__ import annotations

import numpy as np

from dlwp_cs_tpu.utils.misc import days_to_datetime

__all__ = ["align_truth"]


def align_truth(store, init_times, lead_hours):
    """Align store truth with forecasts.

    Args:
      store: predictor store (``fields (T, 6, n, n, C)``, ``times`` days).
      init_times: ``(B,)`` initialization times (days since epoch).
      lead_hours: ``(L,)`` forecast leads in hours.

    Returns dict with:
      ``truth`` (B, L', 6, n, n, C), ``init_fields`` (B, 6, n, n, C),
      ``lead_hours`` (L',) — leads truncated to those with full truth
      coverage, ``valid_months`` (B, L') 0-based months of the valid times.
    """
    times = np.asarray(store.times)
    if len(times) < 2:
        raise ValueError("store must contain at least 2 samples")
    dt = times[1] - times[0]
    init_times = np.asarray(init_times, np.float64)
    lead_hours = np.asarray(lead_hours, np.float64)
    b, n_lead = len(init_times), len(lead_hours)
    shape = (b, n_lead) + store.fields.shape[1:]
    truth = np.zeros(shape, np.float32)
    months = np.zeros((b, n_lead), np.int64)
    valid = np.ones((b, n_lead), bool)
    init_fields = np.zeros((b,) + store.fields.shape[1:], np.float32)
    for bi in range(b):
        idx0 = int(round((init_times[bi] - times[0]) / dt))
        if not 0 <= idx0 < len(times):
            raise ValueError(f"init time {init_times[bi]} outside the store")
        init_fields[bi] = store.fields[idx0]
        for li in range(n_lead):
            t_valid = init_times[bi] + lead_hours[li] / 24.0
            idx = int(round((t_valid - times[0]) / dt))
            if 0 <= idx < len(times):
                truth[bi, li] = store.fields[idx]
                months[bi, li] = days_to_datetime(float(t_valid)).month - 1
            else:
                valid[bi, li] = False
    keep = valid.all(axis=0)
    return {
        "truth": truth[:, keep],
        "init_fields": init_fields,
        "lead_hours": lead_hours[keep],
        "valid_months": months[:, keep],
        "kept": keep,
    }
