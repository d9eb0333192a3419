"""Misc utils, multihost helpers (single-process behavior), roofline."""

import datetime

import numpy as np
import pytest

from dlwp_cs_tpu.parallel import global_mesh, host_batch_slice
from dlwp_cs_tpu.utils import (
    conv_roofline,
    datetime_to_days,
    day_of_year,
    days_to_datetime,
    delete_nan_samples,
    train_test_split_ind,
)


class TestTimeConversions:
    def test_epoch_roundtrip(self):
        d = datetime.datetime(2026, 8, 17, 6, 0)
        days = datetime_to_days(d)
        back = days_to_datetime(float(days))
        assert back.replace(tzinfo=None) == d
        assert days == pytest.approx((d - datetime.datetime(2000, 1, 1)).days + 0.25)

    def test_day_of_year(self):
        assert day_of_year(datetime_to_days(datetime.datetime(2001, 1, 1))) == 1.0
        assert day_of_year(datetime_to_days(datetime.datetime(2001, 12, 31))) == 365.0

    def test_vector(self):
        ds = [datetime.datetime(2020, 1, 1), datetime.datetime(2020, 1, 2)]
        days = datetime_to_days(ds)
        assert days.shape == (2,)
        assert days[1] - days[0] == pytest.approx(1.0)


class TestSplits:
    def test_last_split(self):
        tr, te = train_test_split_ind(10, 3)
        assert list(te) == [7, 8, 9] and len(tr) == 7

    def test_fraction_and_first(self):
        tr, te = train_test_split_ind(10, 0.2, method="first")
        assert list(te) == [0, 1] and len(tr) == 8

    def test_bad_sizes(self):
        with pytest.raises(ValueError):
            train_test_split_ind(5, 5)
        with pytest.raises(ValueError):
            train_test_split_ind(5, 0)


class TestNanHandling:
    def test_delete_nan_samples(self):
        x = np.ones((4, 3))
        x[1, 2] = np.nan
        clean, kept = delete_nan_samples(x)
        assert clean.shape == (3, 3)
        assert list(kept) == [0, 2, 3]


class TestMultihostSingleProcess:
    def test_global_mesh(self):
        mesh = global_mesh(spatial=1)
        assert mesh.shape["spatial"] == 1

    def test_host_batch_slice(self):
        sl = host_batch_slice(16)
        assert sl == slice(0, 16)
        # divisibility only matters multi-process; 3 is fine for 1 process
        assert host_batch_slice(3) == slice(0, 3)


class TestRoofline:
    def test_bound_classification(self):
        small = conv_roofline(batch=1, n=48, cin=4, cout=4)
        assert small["bound"] == "memory"
        big = conv_roofline(batch=64, n=48, cin=512, cout=512)
        assert big["intensity"] > small["intensity"]
