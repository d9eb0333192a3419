"""Pinned rollout regression (SURVEY.md §4.5): fixed seeds, fixed values.

Any numerical change to the conv path, halo semantics, insolation formula,
channel packing or rollout rewiring shows up here.  Golden values generated
on the CPU backend (f32) at commit f560633; loose-enough tolerances to
survive benign op-reordering, tight enough to catch real regressions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, UNetConfig
from dlwp_cs_tpu.rollout import make_rollout_fn

N = 8
GOLDEN_MEAN = -0.004559819120913744
GOLDEN_STD = 0.09651471674442291
GOLDEN_PROBES = {
    (0, 0, 0): 0.11334424465894699,
    (3, 2, 1): -0.026830557733774185,
    (7, 5, 0): 0.005264561623334885,
    (5, 4, 1): 0.002145602600648999,
}


def test_rollout_matches_golden():
    dcfg = DataConfig(grid_n=N, variables=("a", "b"), constants=())
    model = CubeSphereUNet(
        UNetConfig(output_channels=dcfg.output_channels, filters=(4, 8))
    )
    cs = CubedSphere(N)
    lat, lon = cs.cell_latlon
    rng = np.random.default_rng(42)
    x0 = jnp.zeros((1, 6, N, N, dcfg.input_channels))
    params = model.init(jax.random.PRNGKey(7), x0)
    window = jnp.asarray(rng.normal(size=(1, 2, 6, N, N, 2)).astype(np.float32))
    roll = make_rollout_fn(
        model.apply, dcfg, lat=lat, lon=lon,
        insol_mean=300.0, insol_std=400.0, steps=4,
    )
    f = np.asarray(roll(params, window, 123.25).fields)
    assert f.shape == (1, 8, 6, N, N, 2)
    assert float(f.mean()) == pytest.approx(GOLDEN_MEAN, abs=1e-6)
    assert float(f.std()) == pytest.approx(GOLDEN_STD, abs=1e-6)
    for (lead, face, ch), expect in GOLDEN_PROBES.items():
        assert float(f[0, lead, face, 3, 4, ch]) == pytest.approx(
            expect, abs=1e-5
        ), (lead, face, ch)
