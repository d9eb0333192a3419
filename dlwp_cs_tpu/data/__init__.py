"""Data pipeline: stores, series windowing, prefetch, preprocessing, ERA5."""

from dlwp_cs_tpu.data.channels import fold_time, pack_inputs, unfold_time
from dlwp_cs_tpu.data.cfsr import CFSReanalysis, CFSReforecast
from dlwp_cs_tpu.data.era5 import ERA5Reanalysis, read_era5_file, read_netcdf_var
from dlwp_cs_tpu.data.grib2 import Grib2Record, read_grib2
from dlwp_cs_tpu.data.prefetch import PrefetchIterator, prefetch_to_device
from dlwp_cs_tpu.data.preprocessing import Preprocessor
from dlwp_cs_tpu.data.series import SeriesDataset, insolation_stats
from dlwp_cs_tpu.data.store import (
    H5Store,
    MemoryStore,
    normalize_store,
    open_store,
    select_constants,
    write_store,
)
from dlwp_cs_tpu.data.tscache import TSStore, open_ts_cache, write_ts_cache

__all__ = [
    "fold_time",
    "pack_inputs",
    "unfold_time",
    "CFSReanalysis",
    "CFSReforecast",
    "ERA5Reanalysis",
    "read_era5_file",
    "read_netcdf_var",
    "Grib2Record",
    "read_grib2",
    "PrefetchIterator",
    "prefetch_to_device",
    "Preprocessor",
    "SeriesDataset",
    "insolation_stats",
    "H5Store",
    "MemoryStore",
    "normalize_store",
    "open_store",
    "select_constants",
    "write_store",
    "TSStore",
    "open_ts_cache",
    "write_ts_cache",
]
