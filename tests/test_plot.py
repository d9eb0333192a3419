"""Plot helper smoke tests (Agg backend, file output)."""

import pytest
import numpy as np

from dlwp_cs_tpu.plot import plot_cube_faces, plot_error_curves, plot_history
from dlwp_cs_tpu.train import History


def test_plot_cube_faces(tmp_path):
    f = np.random.default_rng(0).normal(size=(6, 8, 8))
    fig = plot_cube_faces(f, title="test", out_path=tmp_path / "faces.png")
    assert (tmp_path / "faces.png").stat().st_size > 1000
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_error_curves(tmp_path):
    lead = np.arange(1, 11) * 6.0
    curves = {"model": np.linspace(1, 5, 10), "persistence": np.linspace(2, 6, 10)}
    fig = plot_error_curves(lead, curves, out_path=tmp_path / "err.png")
    assert (tmp_path / "err.png").exists()
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_history(tmp_path):
    h = History(
        epochs=[
            {"epoch": 0, "train_loss": 1.0, "val_loss": 1.1, "seconds": 1.0},
            {"epoch": 1, "train_loss": 0.5, "val_loss": 0.6, "seconds": 1.0},
        ]
    )
    fig = plot_history(h, out_path=tmp_path / "hist.png")
    assert (tmp_path / "hist.png").exists()
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_cube_faces_nan_robust(tmp_path):
    """Round 5: one NaN cell must not blank every panel (vmin/vmax must be
    nan-robust like plot_latlon_map's)."""
    f = np.random.default_rng(0).normal(size=(6, 8, 8))
    f[2, 3, 3] = np.nan
    fig = plot_cube_faces(f, out_path=tmp_path / "nan.png")
    im = next(ax.images[0] for ax in fig.axes if ax.images)
    lo, hi = im.get_clim()
    assert np.isfinite(lo) and np.isfinite(hi) and hi > lo
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_latlon_map_wrapped_lons(tmp_path):
    """Round 5: equirectangular must reorder columns when lons are wrapped
    to [-180, 180) but still in 0..360 storage order — the image data must
    follow ascending longitude like the axis extent claims."""
    from dlwp_cs_tpu.plot import plot_latlon_map

    lats = np.linspace(-80.0, 80.0, 9)
    lons_sorted = np.arange(-180.0, 180.0, 30.0)
    f_sorted = (np.sin(np.radians(lats))[:, None]
                * np.cos(np.radians(lons_sorted))[None, :])
    # same field, stored in 0..360 order with wrapped coordinate labels
    storage = np.argsort((lons_sorted + 360.0) % 360.0)
    lons_wrapped = lons_sorted[storage]
    f_wrapped = f_sorted[:, storage]
    fig1 = plot_latlon_map(f_sorted, lats, lons_sorted)
    fig2 = plot_latlon_map(f_wrapped, lats, lons_wrapped)
    a1 = np.asarray(fig1.axes[0].images[0].get_array())
    a2 = np.asarray(fig2.axes[0].images[0].get_array())
    np.testing.assert_allclose(a2, a1)
    import matplotlib.pyplot as plt

    plt.close(fig1)
    plt.close(fig2)


def test_bad_shape_rejected():
    import pytest

    with pytest.raises(ValueError):
        plot_cube_faces(np.zeros((5, 8, 8)))


@pytest.mark.parametrize(
    "projection",
    ["equirectangular", "mollweide", "hammer", "aitoff", "orthographic"],
)
def test_plot_latlon_map(tmp_path, projection):
    from dlwp_cs_tpu.plot import plot_latlon_map

    lats = np.linspace(-88.0, 88.0, 45)
    lons = np.arange(0.0, 360.0, 4.0)
    # smooth test field: Y_2^1-ish pattern
    f = np.sin(np.radians(lats))[:, None] * np.cos(np.radians(2 * lons))[None, :]
    fig = plot_latlon_map(
        f, lats, lons, projection=projection, title=projection,
        out_path=tmp_path / f"{projection}.png",
    )
    assert (tmp_path / f"{projection}.png").stat().st_size > 0
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_latlon_map_shape_and_projection_errors():
    from dlwp_cs_tpu.plot import plot_latlon_map

    lats = np.linspace(-80, 80, 10)
    lons = np.linspace(0, 350, 20)
    with pytest.raises(ValueError):
        plot_latlon_map(np.zeros((20, 10)), lats, lons)
    with pytest.raises(ValueError):
        plot_latlon_map(np.zeros((10, 20)), lats, lons, projection="bogus")


def test_plot_rank_histogram(tmp_path):
    from dlwp_cs_tpu.plot import plot_rank_histogram

    counts = np.asarray([120, 95, 88, 97, 130])
    fig = plot_rank_histogram(counts, title="rank",
                              out_path=tmp_path / "rank.png")
    assert (tmp_path / "rank.png").stat().st_size > 0
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_spread_error(tmp_path):
    from dlwp_cs_tpu.plot import plot_spread_error

    lead = np.arange(1, 9) * 6.0
    rmse = np.linspace(0.1, 1.0, 8)
    spread = rmse * 0.9
    fig = plot_spread_error(lead, rmse, spread, members=16,
                            out_path=tmp_path / "se.png")
    assert (tmp_path / "se.png").stat().st_size > 0
    import matplotlib.pyplot as plt

    plt.close(fig)
