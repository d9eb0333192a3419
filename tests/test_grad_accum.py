"""Gradient accumulation (TrainConfig.grad_accum_steps, optax.MultiSteps).

k accumulation micro-steps over k equal shards of a batch must produce the
same parameters as ONE optimizer step on the full batch (up to float
reassociation) when the loss is a mean over samples.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import CubeSphereUNet, TrainConfig, UNetConfig
from dlwp_cs_tpu.ops import mse
from dlwp_cs_tpu.train import init_state, make_optimizer, make_train_step


def _data(b, n, cin, cout, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, 6, n, n, cin)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(b, 6, n, n, cout)).astype(np.float32))
    return x, y


def test_accumulated_equals_full_batch_sgd():
    n, cin, cout, k = 8, 7, 4, 2
    x, y = _data(4, n, cin, cout)
    model = CubeSphereUNet(UNetConfig(output_channels=cout, filters=(4, 8)))
    # the train step donates its state buffers — use a fresh param copy per
    # optimizer
    params_host = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(0), x)
    )

    def fresh_params():
        return jax.tree.map(jnp.asarray, params_host)

    # one full-batch step with plain sgd
    cfg_full = TrainConfig(optimizer="sgd", learning_rate=1e-2)
    opt_full = make_optimizer(cfg_full)
    step_full = make_train_step(model.apply, opt_full, mse)
    s_full = init_state(fresh_params(), opt_full)
    s_full, _ = step_full(s_full, x, y)

    # k accumulation micro-steps over the two halves
    cfg_acc = TrainConfig(optimizer="sgd", learning_rate=1e-2,
                          grad_accum_steps=k)
    opt_acc = make_optimizer(cfg_acc)
    step_acc = make_train_step(model.apply, opt_acc, mse)
    s_acc = init_state(fresh_params(), opt_acc)
    for i in range(k):
        s_acc, _ = step_acc(s_acc, x[i * 2 : (i + 1) * 2], y[i * 2 : (i + 1) * 2])

    full = jax.tree.leaves(s_full.params)
    acc = jax.tree.leaves(s_acc.params)
    for a, b in zip(acc, full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_params_frozen_between_updates():
    n, cin, cout = 8, 7, 4
    x, y = _data(2, n, cin, cout, seed=1)
    model = CubeSphereUNet(UNetConfig(output_channels=cout, filters=(4, 8)))
    params = model.init(jax.random.PRNGKey(0), x)
    cfg = TrainConfig(optimizer="adam", learning_rate=1e-3, grad_accum_steps=3)
    opt = make_optimizer(cfg)
    step = make_train_step(model.apply, opt, mse)
    s = init_state(params, opt)
    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), s.params)
    s, _ = step(s, x, y)
    s, _ = step(s, x, y)
    # two of three micro-steps done: params must be unchanged
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s, _ = step(s, x, y)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(p0))
    )
    assert changed
