"""Verification metric tests."""

import numpy as np
import pytest

from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.verify import (
    acc_curve,
    climo_error,
    forecast_error,
    monthly_climo_error,
    persistence_error,
)

B, L, N, C = 3, 4, 6, 2


def _fields(seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(B, L, 6, N, N, C))


class TestForecastError:
    def test_perfect_forecast_zero(self):
        t = _fields()
        assert np.allclose(forecast_error(t, t), 0.0)

    def test_rmse_of_constant_offset(self):
        t = _fields()
        np.testing.assert_allclose(forecast_error(t + 2.0, t, "rmse"), 2.0)
        np.testing.assert_allclose(forecast_error(t + 2.0, t, "mse"), 4.0)
        np.testing.assert_allclose(forecast_error(t - 2.0, t, "mae"), 2.0)

    def test_shapes_and_channels(self):
        t, f = _fields(0), _fields(1)
        assert forecast_error(f, t).shape == (L,)
        assert forecast_error(f, t, keep_channels=True).shape == (L, C)

    def test_area_weights(self):
        cs = CubedSphere(N)
        t, f = _fields(0), _fields(1)
        w = forecast_error(f, t, weights=cs.area_weights)
        u = forecast_error(f, t)
        assert w.shape == (L,) and not np.allclose(w, u)

    def test_mismatched_shapes_rejected(self):
        with pytest.raises(ValueError):
            forecast_error(_fields(), _fields()[:, :2])
        with pytest.raises(ValueError):
            forecast_error(_fields(), _fields(), method="smape")


class TestBaselines:
    def test_persistence_at_lead_zero_equals_zero(self):
        t = _fields()
        # persistence of the lead-0 truth has zero error at lead 0
        err = persistence_error(t[:, 0], t)
        assert err[0] == pytest.approx(0.0)
        assert err[1] > 0

    def test_climo_error_of_mean_field(self):
        t = _fields()
        climo = t.mean(axis=(0, 1))
        err = climo_error(climo, t)
        assert err.shape == (L,) and (err > 0).all()

    def test_monthly_climo_selects_months(self):
        t = np.zeros((B, L, 6, N, N, C))
        mc = np.arange(12, dtype=np.float64)[:, None, None, None, None] * np.ones(
            (12, 6, N, N, C)
        )
        months = np.zeros((B, L), dtype=int)
        months[:, 1] = 3
        err = monthly_climo_error(mc, t, months)
        np.testing.assert_allclose(err, [0.0, 3.0, 0.0, 0.0])


class TestAcc:
    def test_perfect_acc(self):
        t = _fields()
        climo = np.zeros((6, N, N, C))
        np.testing.assert_allclose(acc_curve(t, t, climo), 1.0)

    def test_anticorrelated(self):
        t = _fields()
        climo = np.zeros((6, N, N, C))
        np.testing.assert_allclose(acc_curve(-t, t, climo), -1.0)
