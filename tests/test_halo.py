"""Halo-extension map E: forward vs cs_pad ghosts, exact transpose VJP,
and the scatter-free-backward guarantee (SURVEY.md §2 row 1 semantics)."""

import numpy as np

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.geometry import CubedSphere
from dlwp_cs_tpu.ops.halo import ext_strips, ext_strips_reference
from dlwp_cs_tpu.ops.padding import cs_pad

N = 8


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def test_ext_matches_cs_pad_ghosts():
    """ext_strips positions must equal the ghost ring of cs_pad (width 1),
    including the averaged corners."""
    x = _rand((2, 6, N, N, 3), seed=1)
    ext = ext_strips(x)  # (B, 6, 4, N+2, C)
    padded = cs_pad(x, 1)  # (B, 6, N+2, N+2, C)
    # S ghosts: padded row 0 (cols 0..N+1 include corners); N: row N+1;
    # W: col 0; E: col N+1 (rows include corners).
    np.testing.assert_allclose(np.asarray(ext[:, :, 0]), np.asarray(padded[:, :, 0, :]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ext[:, :, 1]), np.asarray(padded[:, :, N + 1, :]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ext[:, :, 2]), np.asarray(padded[:, :, :, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ext[:, :, 3]), np.asarray(padded[:, :, :, N + 1]), atol=1e-6)


def test_transpose_vjp_exact():
    """The custom (gather-only) VJP must equal autodiff of the reference
    (whose gather VJP is a scatter) on random cotangents — E^T is exact."""
    x = _rand((2, 6, N, N, 4), seed=2)
    g = _rand((2, 6, 4, N + 2, 4), seed=3)
    _, vjp_custom = jax.vjp(ext_strips, x)
    _, vjp_ref = jax.vjp(ext_strips_reference, x)
    (dx_c,) = vjp_custom(g)
    (dx_r,) = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r), rtol=1e-5, atol=1e-6)


def test_transpose_vjp_exact_c48():
    """Same at the flagship resolution (different table geometry)."""
    x = _rand((1, 6, 48, 48, 2), seed=4)
    g = _rand((1, 6, 4, 50, 2), seed=5)
    _, vjp_custom = jax.vjp(ext_strips, x)
    _, vjp_ref = jax.vjp(ext_strips_reference, x)
    np.testing.assert_allclose(
        np.asarray(vjp_custom(g)[0]), np.asarray(vjp_ref(g)[0]),
        rtol=1e-5, atol=1e-6,
    )


def test_train_step_hlo_scatter_free():
    """The model train-step gradient must lower with ZERO scatter ops —
    the point of the custom VJP (TPU scatters serialize; round-1 HLO had 4
    per conv)."""
    from dlwp_cs_tpu.models import CubeSphereUNet, TrainConfig, UNetConfig
    from dlwp_cs_tpu.train import make_loss_fn, make_optimizer, make_train_step, init_state

    model = CubeSphereUNet(UNetConfig(output_channels=2, filters=(4, 8)))
    tcfg = TrainConfig()
    x = jnp.zeros((2, 6, N, N, 3))
    y = jnp.zeros((2, 6, N, N, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    state = init_state(params, make_optimizer(tcfg))
    step = make_train_step(
        model.apply, make_optimizer(tcfg), make_loss_fn(tcfg), jit=False
    )
    hlo = jax.jit(step).lower(state, x, y).as_text()
    assert hlo.count("scatter") == 0, f"{hlo.count('scatter')} scatters in train-step HLO"


def test_grad_through_deep_model_finite():
    from dlwp_cs_tpu.models import CubeSphereUNet, UNetConfig

    model = CubeSphereUNet(UNetConfig(output_channels=2, filters=(4, 8)))
    x = _rand((2, 6, N, N, 3), seed=6)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))
