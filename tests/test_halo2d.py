"""2-D (row x column) domain decomposition equivalence (SURVEY.md §5.7/§4.4).

The oracle is the single-device ``cs_pad`` / model forward: any orientation,
corner, or offset bug in the 2-D exchange produces O(1) mismatches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dlwp_cs_tpu.models import CubeSphereUNet, TrainConfig, UNetConfig
from dlwp_cs_tpu.ops import cs_pad, mse
from dlwp_cs_tpu.parallel import (
    DATA_AXIS,
    SPATIAL_AXIS,
    SPATIAL_X_AXIS,
    create_mesh,
    make_sharded_pad_2d,
    make_spatial_apply,
    make_spatial_train_step,
)
from dlwp_cs_tpu.train import init_state, make_optimizer, make_train_step

N = 16


def _copy(tree):
    return jax.tree.map(jnp.copy, tree)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestShardedPad2D:
    @pytest.mark.parametrize(
        "sy,sx,width",
        [(2, 2, 1), (2, 2, 2), (4, 2, 1), (2, 4, 1), (1, 4, 1), (8, 1, 2)],
    )
    def test_matches_cs_pad(self, eight_devices, sy, sx, width):
        x = _rand((2, 6, N, N, 3))
        ref = np.asarray(cs_pad(x, width))
        mesh = create_mesh(data=1, spatial=sy, spatial_x=sx)
        pad = make_sharded_pad_2d(sy, sx)
        spec = P(
            None,
            None,
            SPATIAL_AXIS,
            SPATIAL_X_AXIS if sx > 1 else None,
            None,
        )
        fn = jax.jit(
            jax.shard_map(
                lambda v: pad(v, width),
                mesh=mesh,
                in_specs=(spec,),
                out_specs=spec,
                check_vma=False,
            )
        )
        out = np.asarray(fn(x))
        # the sharded output tiles carry per-tile padding; compare each tile
        # against the corresponding slice of the global padded field
        h, wl = N // sy, N // sx
        w = width
        for iy in range(sy):
            for jx in range(sx):
                tile = out[
                    :,
                    :,
                    iy * (h + 2 * w) : (iy + 1) * (h + 2 * w),
                    jx * (wl + 2 * w) : (jx + 1) * (wl + 2 * w),
                    :,
                ]
                want = ref[
                    :,
                    :,
                    iy * h : iy * h + h + 2 * w,
                    jx * wl : jx * wl + wl + 2 * w,
                    :,
                ]
                np.testing.assert_allclose(
                    tile, want, atol=1e-6, err_msg=f"tile ({iy}, {jx})"
                )


class TestSpatial2DModel:
    def _setup(self, seed=0):
        cfg = UNetConfig(output_channels=2, filters=(4, 8))
        model = CubeSphereUNet(cfg)
        x = _rand((4, 6, N, N, 3), seed=seed)
        params = model.init(jax.random.PRNGKey(0), x)
        return model, params, x

    def test_apply_matches_single(self, eight_devices):
        model, params, x = self._setup()
        ref = np.asarray(model.apply(params, x))
        mesh = create_mesh(data=2, spatial=2, spatial_x=2)
        out = np.asarray(make_spatial_apply(model.apply, mesh)(params, x))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_train_step_matches_single(self, eight_devices):
        model, params, x = self._setup()
        y = _rand((4, 6, N, N, 2), seed=5)
        opt = make_optimizer(TrainConfig(learning_rate=1e-3))
        ref_state, ref_m = make_train_step(model.apply, opt, mse)(
            init_state(_copy(params), opt), x, y
        )
        mesh = create_mesh(data=2, spatial=2, spatial_x=2)
        state, m = make_spatial_train_step(model.apply, opt, mse, mesh)(
            init_state(_copy(params), opt), x, y
        )
        assert float(m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-4)
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(ref_state.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_area_weighted_train_step_matches_single(self, eight_devices):
        from dlwp_cs_tpu.geometry import CubedSphere
        from dlwp_cs_tpu.ops import AreaWeightedLoss

        model, params, x = self._setup()
        y = _rand((4, 6, N, N, 2), seed=5)
        loss_fn = AreaWeightedLoss("mse", CubedSphere(N).area_weights)
        opt = make_optimizer(TrainConfig(learning_rate=1e-3))
        ref_state, ref_m = make_train_step(model.apply, opt, loss_fn)(
            init_state(_copy(params), opt), x, y
        )
        mesh = create_mesh(data=2, spatial=2, spatial_x=2)
        state, m = make_spatial_train_step(model.apply, opt, loss_fn, mesh)(
            init_state(_copy(params), opt), x, y
        )
        assert float(m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-4)
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(ref_state.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    @pytest.mark.slow
    def test_flagship_depth_2d_apply(self, eight_devices):
        """C48 depth-3 (32,64,128) under the 2x2 tiling: the coarsest level
        is 12x12 -> 6x6 tiles, the BASELINE config-5 shape at Sy*Sx=4."""
        cfg = UNetConfig(output_channels=4, filters=(32, 64, 128))
        model = CubeSphereUNet(cfg)
        x = _rand((2, 6, 48, 48, 7), seed=3)
        params = model.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(model.apply(params, x))
        mesh = create_mesh(data=2, spatial=2, spatial_x=2)
        out = np.asarray(make_spatial_apply(model.apply, mesh)(params, x))
        np.testing.assert_allclose(out, ref, atol=2e-4)
