"""Plotting helpers."""

from dlwp_cs_tpu.plot.maps import (
    plot_cube_faces,
    plot_error_curves,
    plot_history,
    plot_latlon_map,
    plot_rank_histogram,
    plot_spread_error,
)

__all__ = [
    "plot_cube_faces",
    "plot_error_curves",
    "plot_history",
    "plot_latlon_map",
    "plot_rank_histogram",
    "plot_spread_error",
]
