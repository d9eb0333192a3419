"""Trainer with a DP mesh: training + validation sharded end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import CubeSphereUNet, TrainConfig, UNetConfig
from dlwp_cs_tpu.parallel import create_mesh
from dlwp_cs_tpu.train import Trainer

N = 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_with_mesh_matches_single_device():
    model = CubeSphereUNet(UNetConfig(output_channels=2, filters=(4,)))
    cfg = TrainConfig(learning_rate=1e-2, max_epochs=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 6, N, N, 3)).astype(np.float32))
    y = 0.5 * x[..., :2]

    t_ref = Trainer(model, cfg)
    s_ref = t_ref.fit(t_ref.init(x), [(x, y)], val_data=[(x, y)], verbose=False)

    mesh = create_mesh(data=8, spatial=1)
    t_dp = Trainer(model, cfg, mesh=mesh)
    s_dp = t_dp.fit(t_dp.init(x), [(x, y)], val_data=[(x, y)], verbose=False)

    for a, b in zip(t_ref.history.epochs, t_dp.history.epochs):
        assert a["train_loss"] == pytest.approx(b["train_loss"], rel=1e-4)
        assert a["val_loss"] == pytest.approx(b["val_loss"], rel=1e-4)
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
