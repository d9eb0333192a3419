"""BASELINE config 5 wiring: domain-decomposed rollout == single-device
rollout (the forecast path under the spatial mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, UNetConfig
from dlwp_cs_tpu.parallel import create_mesh, make_spatial_apply
from dlwp_cs_tpu.rollout import make_rollout_fn

N = 16
DCFG = DataConfig(
    grid_n=N,
    variables=("a", "b"),
    input_time_steps=2,
    output_time_steps=2,
    constants=("c",),
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_rollout_matches_single_device():
    model = CubeSphereUNet(
        UNetConfig(output_channels=DCFG.output_channels, filters=(4, 8))
    )
    cs = CubedSphere(N)
    lat, lon = cs.cell_latlon
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((2, 6, N, N, DCFG.input_channels))
    params = model.init(jax.random.PRNGKey(0), x0)
    consts = jnp.asarray(rng.normal(size=(6, N, N, 1)).astype(np.float32))
    window = jnp.asarray(rng.normal(size=(2, 2, 6, N, N, 2)).astype(np.float32))

    common = dict(
        lat=lat, lon=lon, constants=consts, insol_mean=300.0, insol_std=400.0,
        steps=3,
    )
    ref = make_rollout_fn(model.apply, DCFG, **common)(params, window, 42.25)

    mesh = create_mesh(data=2, spatial=4)
    sharded_apply = make_spatial_apply(model.apply, mesh, jit=False)
    fc = jax.jit(make_rollout_fn(sharded_apply, DCFG, **common))(
        params, window, 42.25
    )
    np.testing.assert_allclose(
        np.asarray(fc.fields), np.asarray(ref.fields), atol=3e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_rollout_2d_mesh_matches_single_device():
    """Same forecast path under the 2-D (row x column) intra-face tiling."""
    model = CubeSphereUNet(
        UNetConfig(output_channels=DCFG.output_channels, filters=(4, 8))
    )
    cs = CubedSphere(N)
    lat, lon = cs.cell_latlon
    rng = np.random.default_rng(1)
    x0 = jnp.zeros((2, 6, N, N, DCFG.input_channels))
    params = model.init(jax.random.PRNGKey(0), x0)
    consts = jnp.asarray(rng.normal(size=(6, N, N, 1)).astype(np.float32))
    window = jnp.asarray(rng.normal(size=(2, 2, 6, N, N, 2)).astype(np.float32))

    common = dict(
        lat=lat, lon=lon, constants=consts, insol_mean=300.0, insol_std=400.0,
        steps=3,
    )
    ref = make_rollout_fn(model.apply, DCFG, **common)(params, window, 42.25)

    mesh = create_mesh(data=2, spatial=2, spatial_x=2)
    sharded_apply = make_spatial_apply(model.apply, mesh, jit=False)
    fc = jax.jit(make_rollout_fn(sharded_apply, DCFG, **common))(
        params, window, 42.25
    )
    np.testing.assert_allclose(
        np.asarray(fc.fields), np.asarray(ref.fields), atol=3e-5
    )
