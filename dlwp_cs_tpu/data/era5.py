"""ERA5 acquisition via the Copernicus CDS API.

Capability parity with ``DLWP/data/era5.py::ERA5Reanalysis`` (SURVEY.md §2
row 13): variable tables mapping short names to CDS product names, parallel
per-variable/level retrieval through ``cdsapi``, and an ``open()`` that
exposes downloaded files as arrays for the Preprocessor.

Environment note (SURVEY.md §7a): this machine has no network and no cdsapi
package, so ``retrieve`` degrades to a clear error; ``open`` reads previously
downloaded netCDF4 files directly with h5py (netCDF4 files are HDF5), since
the xarray/netCDF4 stack is unavailable.
"""

from __future__ import annotations

import concurrent.futures
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

__all__ = ["ERA5Reanalysis", "read_netcdf_var", "netcdf_time_to_epoch_days"]

# Short name -> (CDS dataset, CDS variable name, pressure-level product?)
VARIABLE_TABLE = {
    "z": ("reanalysis-era5-pressure-levels", "geopotential", True),
    "t": ("reanalysis-era5-pressure-levels", "temperature", True),
    "u": ("reanalysis-era5-pressure-levels", "u_component_of_wind", True),
    "v": ("reanalysis-era5-pressure-levels", "v_component_of_wind", True),
    "q": ("reanalysis-era5-pressure-levels", "specific_humidity", True),
    "r": ("reanalysis-era5-pressure-levels", "relative_humidity", True),
    "t2m": ("reanalysis-era5-single-levels", "2m_temperature", False),
    "tcwv": ("reanalysis-era5-single-levels", "total_column_water_vapour", False),
    "msl": ("reanalysis-era5-single-levels", "mean_sea_level_pressure", False),
    "sst": ("reanalysis-era5-single-levels", "sea_surface_temperature", False),
    "u10": ("reanalysis-era5-single-levels", "10m_u_component_of_wind", False),
    "v10": ("reanalysis-era5-single-levels", "10m_v_component_of_wind", False),
}

# Hours between 1900-01-01 (ERA5 time epoch) and 2000-01-01 (ours).
_ERA5_EPOCH_OFFSET_HOURS = 876_576.0


def netcdf_time_to_epoch_days(hours_since_1900) -> np.ndarray:
    """ERA5 'hours since 1900-01-01' -> days since 2000-01-01 00 UTC."""
    return (np.asarray(hours_since_1900, np.float64) - _ERA5_EPOCH_OFFSET_HOURS) / 24.0


def read_netcdf_var(path, name: str) -> np.ndarray:
    """Read one variable from a netCDF4 file via h5py, applying the CF
    ``scale_factor``/``add_offset`` packing attributes if present."""
    import h5py

    with h5py.File(path, "r") as f:
        if name not in f:
            raise KeyError(f"{name!r} not in {path}; has {sorted(f.keys())}")
        ds = f[name]
        data = np.asarray(ds)
        scale = ds.attrs.get("scale_factor", None)
        offset = ds.attrs.get("add_offset", None)
        fill = ds.attrs.get("_FillValue", None)
        data = data.astype(np.float64)
        if fill is not None:
            data[np.asarray(ds) == fill] = np.nan
        if scale is not None:
            data = data * float(np.asarray(scale))
        if offset is not None:
            data = data + float(np.asarray(offset))
        return data


@dataclass
class ERA5Reanalysis:
    """ERA5 download manager (API parity with the reference's class).

    ``retrieve`` downloads one netCDF file per (variable, level) in parallel;
    ``open`` returns ``{key: (T, H, W) array}`` plus coordinate vectors,
    ready for :class:`dlwp_cs_tpu.data.preprocessing.Preprocessor`.
    """

    root_directory: str | Path = "era5"
    file_format: str = "{var}_{level}.nc"
    _files: dict = field(default_factory=dict)

    def _target(self, var: str, level: int | str) -> Path:
        return Path(self.root_directory) / self.file_format.format(
            var=var, level=level
        )

    def retrieve(
        self,
        variables: list[str],
        levels: list[int | str],
        *,
        years: list[int],
        months: list[int] | None = None,
        hours: list[int] | None = None,
        grid: tuple[float, float] = (1.0, 1.0),
        n_jobs: int = 4,
        overwrite: bool = False,
    ) -> list[Path]:
        """Download each (variable, level) product; returns file paths."""
        try:
            import cdsapi  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "cdsapi is not installed (and this environment has no network); "
                "ERA5 retrieval requires a machine with CDS access. "
                "Previously downloaded files can still be opened with .open()."
            ) from e
        months = months or list(range(1, 13))
        hours = hours or [0, 6, 12, 18]
        jobs = []
        for var in variables:
            if var not in VARIABLE_TABLE:
                raise KeyError(f"unknown variable {var!r}; known {sorted(VARIABLE_TABLE)}")
            dataset, cds_name, has_levels = VARIABLE_TABLE[var]
            for level in levels if has_levels else ["single"]:
                target = self._target(var, level)
                if target.exists() and not overwrite:
                    continue
                req = {
                    "product_type": "reanalysis",
                    "variable": cds_name,
                    "year": [str(y) for y in years],
                    "month": [f"{m:02d}" for m in months],
                    "day": [f"{d:02d}" for d in range(1, 32)],
                    "time": [f"{h:02d}:00" for h in hours],
                    "grid": list(grid),
                    "format": "netcdf",
                }
                if has_levels:
                    req["pressure_level"] = str(level)
                jobs.append((dataset, req, target))
        Path(self.root_directory).mkdir(parents=True, exist_ok=True)

        def _one(job):
            import cdsapi

            dataset, req, target = job
            cdsapi.Client().retrieve(dataset, req, str(target))
            return target

        with concurrent.futures.ThreadPoolExecutor(max_workers=n_jobs) as pool:
            return list(pool.map(_one, jobs))

    def open(
        self,
        variables: list[str],
        levels: list[int | str],
        *,
        var_key_format: str = "{var}{level}",
    ):
        """Open downloaded files: returns (sources, lats_rad, lons_rad, times_days).

        ``sources`` maps e.g. ``z500`` -> (T, H, W) float array.  Latitudes
        are flipped to ascending and longitudes converted to [0, 2pi), the
        Preprocessor's convention.
        """
        sources = {}
        lats = lons = times = None
        for var in variables:
            _, _, has_levels = VARIABLE_TABLE[var]
            for level in levels if has_levels else ["single"]:
                path = self._target(var, level)
                if not path.exists():
                    raise FileNotFoundError(path)
                data = read_netcdf_var(path, _guess_payload_name(path))
                la = np.deg2rad(read_netcdf_var(path, "latitude"))
                lo = np.deg2rad(read_netcdf_var(path, "longitude"))
                tm = netcdf_time_to_epoch_days(read_netcdf_var(path, "time"))
                if la[0] > la[-1]:  # ERA5 ships north->south; flip ascending
                    la = la[::-1]
                    data = data[:, ::-1]
                key = (
                    var_key_format.format(var=var, level=level)
                    if has_levels
                    else var
                )
                sources[key] = data
                lats, lons, times = la, lo, tm
        return sources, lats, lons, times


def _guess_payload_name(path) -> str:
    """Pick the payload variable in a netCDF file (not a coordinate)."""
    import h5py

    skip = {"latitude", "longitude", "time", "level", "expver", "number"}
    with h5py.File(path, "r") as f:
        names = [k for k in f.keys() if k not in skip]
    if len(names) != 1:
        raise ValueError(f"ambiguous payload variables {names} in {path}")
    return names[0]
