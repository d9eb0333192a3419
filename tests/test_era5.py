"""ERA5 reader tests against synthetic netCDF-like HDF5 files.

Real retrieval needs network/cdsapi (absent here — SURVEY.md §7a); the
*reading* path (h5py + CF packing + coordinate handling) is fully testable
with files that mimic ERA5's netCDF4 layout.
"""

import numpy as np
import pytest

from dlwp_cs_tpu.data import ERA5Reanalysis, read_netcdf_var
from dlwp_cs_tpu.data.era5 import netcdf_time_to_epoch_days


def _write_era5_like(path, var_name, *, t=4, h=19, w=36, packed=False):
    import h5py

    rng = np.random.default_rng(0)
    data = 5000.0 + 50.0 * rng.normal(size=(t, h, w))
    with h5py.File(path, "w") as f:
        if packed:
            scale, offset = 0.01, 5000.0
            stored = np.round((data - offset) / scale).astype(np.int16)
            ds = f.create_dataset(var_name, data=stored)
            ds.attrs["scale_factor"] = np.float64(scale)
            ds.attrs["add_offset"] = np.float64(offset)
            data = stored.astype(np.float64) * scale + offset
        else:
            f.create_dataset(var_name, data=data)
        # ERA5 ships latitudes north->south, longitudes 0..360
        f.create_dataset("latitude", data=np.linspace(90, -90, h))
        f.create_dataset("longitude", data=np.arange(w) * (360.0 / w))
        # hours since 1900-01-01; start at 2010-01-01 00 UTC
        hours0 = 876576.0 + 87648.0 + 876.0 * 0  # just a fixed large value
        f.create_dataset("time", data=hours0 + 6.0 * np.arange(t))
    return data


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
