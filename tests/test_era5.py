"""ERA5 reader tests against synthetic netCDF-like HDF5 files.

Real retrieval needs network/cdsapi (absent here — SURVEY.md §7a); the
*reading* path (h5py + CF packing + coordinate/time-units handling) is fully
testable with files that mimic both CDS schemas: legacy (``time`` in hours
since 1900, optional ERA5/ERA5T ``expver`` split) and current-2024
(``valid_time`` in seconds since 1970, per-time ``expver`` labels, packed
shorts).
"""

import numpy as np
import pytest

from dlwp_cs_tpu.data import ERA5Reanalysis, read_netcdf_var
from dlwp_cs_tpu.data.era5 import (
    cf_time_to_epoch_days,
    netcdf_time_to_epoch_days,
    parse_cf_time_units,
    read_era5_file,
)

# hours from 1900-01-01 to 2010-01-03 00 UTC (2000 + 10y incl. leaps + 2d)
_H1900_2010 = 876576.0 + 3653 * 24.0 + 48.0
# seconds from 1970-01-01 to the same instant
_S1970_2010 = ((2010 - 1970) * 365 + 10 + 2) * 86400.0


def _write_era5_like(
    path,
    var_name,
    *,
    t=4,
    h=19,
    w=36,
    packed=False,
    schema="legacy",
    expver_split=False,
    time_units=None,
    seed=0,
    lat0=90.0,
):
    """Write a CDS-like netCDF4(HDF5) file; returns the truth array."""
    import h5py

    rng = np.random.default_rng(seed)
    data = 5000.0 + 50.0 * rng.normal(size=(t, h, w))
    with h5py.File(path, "w") as f:
        if expver_split:
            # legacy ERA5/ERA5T: (T, 2, H, W), each time finite in ONE slice
            stored = np.full((t, 2, h, w), np.nan)
            for i in range(t):
                stored[i, i % 2] = data[i]
            ds = f.create_dataset(var_name, data=stored)
            ds.attrs["_FillValue"] = np.float64(np.nan)
            f.create_dataset("expver", data=np.array([1, 5]))
        elif packed:
            scale, offset = 0.01, 5000.0
            stored = np.round((data - offset) / scale).astype(np.int16)
            ds = f.create_dataset(var_name, data=stored)
            ds.attrs["scale_factor"] = np.float64(scale)
            ds.attrs["add_offset"] = np.float64(offset)
            data = stored.astype(np.float64) * scale + offset
        else:
            f.create_dataset(var_name, data=data)
        # ERA5 ships latitudes north->south, longitudes 0..360
        f.create_dataset("latitude", data=np.linspace(lat0, -lat0, h))
        f.create_dataset("longitude", data=np.arange(w) * (360.0 / w))
        if schema == "legacy":
            tds = f.create_dataset(
                "time", data=_H1900_2010 + 6.0 * np.arange(t)
            )
            tds.attrs["units"] = time_units or b"hours since 1900-01-01 00:00:00.0"
        else:  # current-2024 CDS schema
            tds = f.create_dataset(
                "valid_time", data=(_S1970_2010 + 21600.0 * np.arange(t)).astype(np.int64)
            )
            tds.attrs["units"] = time_units or b"seconds since 1970-01-01"
            if not expver_split:
                f.create_dataset(
                    "expver", data=np.array([b"0001"] * t)
                )
            f.create_dataset("number", data=np.int64(0))
    return data


class TestCFUnits:
    def test_hours_since_1900(self):
        scale, off = parse_cf_time_units("hours since 1900-01-01 00:00:00.0")
        assert scale == 1 / 24.0
        np.testing.assert_allclose(876576.0 * scale + off, 0.0)

    def test_seconds_since_1970(self):
        days = cf_time_to_epoch_days(
            np.array([0.0, 86400.0]), "seconds since 1970-01-01"
        )
        # 1970-01-01 is 10957 days before 2000-01-01
        np.testing.assert_allclose(days, [-10957.0, -10956.0])

    def test_iso_t_and_z_suffixes(self):
        s1, o1 = parse_cf_time_units("seconds since 1970-01-01T00:00:00Z")
        s2, o2 = parse_cf_time_units("seconds since 1970-01-01")
        assert (s1, o1) == (s2, o2)

    def test_days_and_minutes(self):
        assert parse_cf_time_units("days since 2000-01-01") == (1.0, 0.0)
        scale, off = parse_cf_time_units("minutes since 2000-01-02 12:00")
        np.testing.assert_allclose(1440 * scale + off, 2.5)

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            parse_cf_time_units("fortnights since the epoch")
        with pytest.raises(ValueError):
            parse_cf_time_units("hours since someday")


class TestReadNetcdf:
    def test_plain_and_packed(self, tmp_path):
        p1 = tmp_path / "z_500.nc"
        truth = _write_era5_like(p1, "z")
        out = read_netcdf_var(p1, "z")
        np.testing.assert_allclose(out, truth)

        p2 = tmp_path / "packed.nc"
        truth2 = _write_era5_like(p2, "z", packed=True)
        out2 = read_netcdf_var(p2, "z")
        np.testing.assert_allclose(out2, truth2, rtol=1e-6)

    def test_missing_variable(self, tmp_path):
        p = tmp_path / "z_500.nc"
        _write_era5_like(p, "z")
        with pytest.raises(KeyError):
            read_netcdf_var(p, "nope")

    def test_missing_value_attr_masked(self, tmp_path):
        """Round 5: files converted via wgrib2/CDO mark gaps with CF
        `missing_value` (no `_FillValue`) — unmasked packed fills would
        pass through scale/offset as plausible extreme values."""
        import h5py

        p = tmp_path / "mv.nc"
        data = np.arange(12.0).reshape(3, 4)
        stored = data.copy()
        stored[1, 2] = -9999.0
        with h5py.File(p, "w") as f:
            ds = f.create_dataset("z", data=stored)
            ds.attrs["missing_value"] = np.float64(-9999.0)
        out = read_netcdf_var(p, "z")
        assert np.isnan(out[1, 2])
        mask = np.ones_like(data, bool)
        mask[1, 2] = False
        np.testing.assert_allclose(out[mask], data[mask])


class TestReadFile:
    def test_legacy_schema(self, tmp_path):
        p = tmp_path / "z_500.nc"
        truth = _write_era5_like(p, "z")
        data, lats, lons, times = read_era5_file(p)
        np.testing.assert_allclose(data, truth[:, ::-1])
        assert lats[0] < lats[-1]
        np.testing.assert_allclose(np.diff(times), 0.25)

    def test_current_schema_valid_time_expver_number(self, tmp_path):
        # 2024-era CDS: valid_time (s since 1970), expver labels, packed
        p = tmp_path / "t2m_single.nc"
        truth = _write_era5_like(p, "t2m", schema="current", packed=True)
        data, lats, lons, times = read_era5_file(p)
        np.testing.assert_allclose(data, truth[:, ::-1], rtol=1e-6)
        np.testing.assert_allclose(np.diff(times), 0.25)
        # decodes to the SAME absolute epoch-days as the legacy file
        p2 = tmp_path / "legacy.nc"
        _write_era5_like(p2, "t2m")
        _, _, _, times2 = read_era5_file(p2)
        np.testing.assert_allclose(times, times2)

    def test_expver_split_collapse(self, tmp_path):
        p = tmp_path / "z_500.nc"
        truth = _write_era5_like(p, "z", expver_split=True)
        data, _, _, _ = read_era5_file(p)
        assert data.shape == truth.shape
        assert np.all(np.isfinite(data))
        np.testing.assert_allclose(data, truth[:, ::-1])

    def test_missing_units_rejected(self, tmp_path):
        import h5py

        p = tmp_path / "z_500.nc"
        _write_era5_like(p, "z")
        with h5py.File(p, "a") as f:
            del f["time"].attrs["units"]
        with pytest.raises(ValueError, match="units"):
            read_era5_file(p)


class TestOpen:
    def test_open_orients_and_names(self, tmp_path):
        era = ERA5Reanalysis(root_directory=tmp_path)
        truth = _write_era5_like(tmp_path / "z_500.nc", "z")
        sources, lats, lons, times = era.open(["z"], [500])
        assert "z500" in sources
        # ascending latitudes, data flipped to match
        assert lats[0] < lats[-1]
        np.testing.assert_allclose(sources["z500"], truth[:, ::-1])
        assert lons.min() >= 0 and lons.max() < 2 * np.pi
        assert np.all(np.diff(times) == pytest.approx(0.25))

    def test_open_mixed_schemas_consistent(self, tmp_path):
        era = ERA5Reanalysis(root_directory=tmp_path)
        _write_era5_like(tmp_path / "z_500.nc", "z")
        _write_era5_like(tmp_path / "t2m_single.nc", "t2m", schema="current")
        sources, lats, lons, times = era.open(["z", "t2m"], [500])
        assert set(sources) == {"z500", "t2m"}

    def test_open_rejects_misaligned_files(self, tmp_path):
        era = ERA5Reanalysis(root_directory=tmp_path)
        _write_era5_like(tmp_path / "z_500.nc", "z")
        _write_era5_like(tmp_path / "t2m_single.nc", "t2m", lat0=89.0)
        with pytest.raises(ValueError, match="latitude"):
            era.open(["z", "t2m"], [500])

    def test_missing_file(self, tmp_path):
        era = ERA5Reanalysis(root_directory=tmp_path)
        with pytest.raises(FileNotFoundError):
            era.open(["z"], [850])

    def test_retrieve_without_cdsapi(self, tmp_path):
        era = ERA5Reanalysis(root_directory=tmp_path)
        with pytest.raises((RuntimeError, KeyError)):
            era.retrieve(["z"], [500], years=[2020])

    def test_unknown_variable(self, tmp_path):
        era = ERA5Reanalysis(root_directory=tmp_path)
        with pytest.raises((RuntimeError, KeyError)):
            era.retrieve(["vorticity_of_doom"], [500], years=[2020])


def test_time_conversion():
    # 1900-01-01 + 876576 h == 2000-01-01
    assert netcdf_time_to_epoch_days(876576.0) == 0.0
    assert netcdf_time_to_epoch_days(876576.0 + 36.0) == 1.5
