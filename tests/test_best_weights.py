"""Best-weights restore must survive buffer donation.

Regression for a real bug: the jitted train step donates its state, so
storing ``state.params`` by reference in the early stopper left deleted
device buffers whenever the best epoch was not the last one.  This test
diverges training (huge LR) so the best epoch is early, then materializes
the restored parameters.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import CubeSphereUNet, TrainConfig, UNetConfig
from dlwp_cs_tpu.train import Trainer

N = 8


def test_restored_best_params_are_alive_and_best():
    model = CubeSphereUNet(UNetConfig(output_channels=2, filters=(4,)))
    cfg = TrainConfig(
        learning_rate=5.0,  # diverges: best epoch will be an early one
        max_epochs=4,
        early_stopping_patience=10,
        restore_best_weights=True,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 6, N, N, 3)).astype(np.float32))
    y = 0.5 * x[..., :2]
    trainer = Trainer(model, cfg)
    state = trainer.init(x)
    init_params = jax.tree.map(np.asarray, state.params)
    state = trainer.fit(state, [(x, y)], val_data=[(x, y)], verbose=False)
    losses = [r["val_loss"] for r in trainer.history.epochs]
    assert min(losses) < losses[-1], "test needs a diverging run"
    # The bug raised RuntimeError (deleted buffers) right here:
    restored = [np.asarray(l) for l in jax.tree.leaves(state.params)]
    assert all(np.isfinite(r).all() for r in restored)
    # and the restored params reproduce the best epoch's val loss (val is
    # computed at epoch end, aligned with the best-weights snapshot)
    from dlwp_cs_tpu.ops import mse

    val = float(mse(model.apply(state.params, x), y))
    assert val == min(losses) or abs(val - min(losses)) < 1e-6 * max(1.0, val)
