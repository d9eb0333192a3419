"""Example 1: build a cubed-sphere predictor store.

Workflow parity with the reference's download -> preprocess -> remap chain
(SURVEY.md §3.1).  With ERA5 netCDF files present (downloaded via
``dlwp_cs_tpu.data.ERA5Reanalysis.retrieve`` on a machine with CDS access),
point ``--era5-dir`` at them; otherwise a synthetic-but-physical dataset
(analytic wave fields + seasonal cycle on a lat-lon grid) is generated so the
whole pipeline runs end-to-end offline.

Usage:
  python examples/01_build_dataset.py --workdir /tmp/dlwp --grid 24 \
      [--nlat 46 --nlon 90 --days 120] [--era5-dir DIR] [--remap conservative|bilinear]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from dlwp_cs_tpu.data import Preprocessor
from dlwp_cs_tpu.remap import latlon_grid


def synthetic_sources(n_lat: int, n_lon: int, days: float, step_hours: float):
    """Analytic lat-lon 'reanalysis': traveling waves + seasonal cycle."""
    lats, lons = latlon_grid(n_lat, n_lon)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    times = np.arange(0.0, days, step_hours / 24.0)  # days since 2000-01-01
    t = times[:, None, None]
    x = np.cos(glat) * np.cos(glon)
    y = np.cos(glat) * np.sin(glon)
    z = np.sin(glat)
    season = np.cos(2 * np.pi * t / 365.25)
    wave = lambda k, c, amp: amp * np.cos(k * glon - c * 2 * np.pi * t) * np.cos(
        glat
    ) ** 2
    sources = {
        "z500": 5500.0 + 100.0 * z[None] * season + wave(4, 0.35, 80.0),
        "z1000": 100.0 + 40.0 * z[None] * season + wave(3, 0.30, 40.0),
        "tau300-700": 7500.0 - 300.0 * np.abs(z)[None] + wave(5, 0.4, 60.0),
        "t2m": 288.0 - 30.0 * z[None] ** 2 + 10.0 * z[None] * season
        + wave(6, 0.5, 2.0),
    }
    constants = {
        "topography": np.maximum(0.0, 2000.0 * (x * y + 0.3 * z * z)),
        "land_sea_mask": (x * y + 0.3 * z > 0).astype(np.float64),
    }
    return sources, constants, lats, lons, times


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--grid", type=int, default=24, help="cubed-sphere C{n}")
    ap.add_argument("--nlat", type=int, default=46)
    ap.add_argument("--nlon", type=int, default=90)
    ap.add_argument("--days", type=float, default=120.0)
    ap.add_argument("--step-hours", type=float, default=6.0)
    ap.add_argument("--era5-dir", default=None, help="dir of downloaded ERA5 files")
    ap.add_argument(
        "--remap",
        default="conservative",
        choices=("conservative", "bilinear"),
        help="ll->cs regridding: exact conservative weights (C++ generator, "
        "the default — requires a C++ toolchain) or bilinear",
    )
    args = ap.parse_args()
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    if args.era5_dir:
        from dlwp_cs_tpu.data import ERA5Reanalysis

        era = ERA5Reanalysis(root_directory=args.era5_dir)
        sources, lats, lons, times = era.open(["z", "t2m"], [500, 1000])
        constants = {}
    else:
        sources, constants, lats, lons, times = synthetic_sources(
            args.nlat, args.nlon, args.days, args.step_hours
        )

    weights = None
    if args.remap == "conservative":
        from dlwp_cs_tpu.remap import conservative_weights

        weights = conservative_weights(
            "ll2cs", n_lat=len(lats), n_lon=len(lons), n_cs=args.grid
        )

    pre = Preprocessor(sources, lats, lons, times)
    store = pre.data_to_series(
        args.grid,
        weights=weights,
        constant_sources=constants or None,
        path=workdir / "predictors_cs.h5",
    )
    print(
        f"wrote {workdir / 'predictors_cs.h5'}: fields {store.fields.shape}, "
        f"vars {store.variables}, constants {store.constant_names}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
