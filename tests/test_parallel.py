"""Sharding equivalence tests on the virtual 8-device CPU mesh
(SURVEY.md §4.4): 1-device vs N-device outputs must agree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import CubeSphereUNet, TrainConfig, UNetConfig
from dlwp_cs_tpu.ops import cs_pad, mse
from dlwp_cs_tpu.parallel import (
    create_mesh,
    make_dp_train_step,
    make_spatial_apply,
    make_spatial_train_step,
    shard_batch,
)
from dlwp_cs_tpu.train import init_state, make_optimizer, make_train_step

N = 16


def _copy(tree):
    # train steps donate their state; give each state its own buffers
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


class TestShardedPad:
    @pytest.mark.parametrize("spatial,width", [(2, 1), (4, 1), (4, 2), (8, 2)])
    def test_matches_single_device(self, eight_devices, spatial, width):
        from dlwp_cs_tpu.parallel.halo import sharded_cs_pad
        from jax.sharding import PartitionSpec as P

        mesh = create_mesh(data=1, spatial=spatial)
        x = _rand((2, 6, N, N, 3), seed=1)
        ref = np.asarray(cs_pad(x, width))
        w = width

        fn = jax.jit(
            jax.shard_map(
                lambda xl: sharded_cs_pad(xl, w, n_shards=spatial),
                mesh=mesh,
                in_specs=P(None, None, "spatial", None, None),
                out_specs=P(None, None, "spatial", None, None),
                check_vma=False,
            )
        )
        out = np.asarray(fn(x))
        # Sharded output stacks local padded blocks along rows: block s holds
        # padded rows of band s. Compare band-by-band against the reference.
        h = N // spatial
        assert out.shape == (2, 6, N + spatial * 2 * w, N + 2 * w, 3)
        for s in range(spatial):
            local = out[:, :, s * (h + 2 * w) : (s + 1) * (h + 2 * w)]
            lo = s * h
            # rows of the global padded array covering band s incl. halos
            expect = ref[:, :, lo : lo + h + 2 * w, :]
            np.testing.assert_allclose(local, expect, atol=1e-6, err_msg=f"band {s}")

    def test_bad_width_rejected(self, eight_devices):
        from dlwp_cs_tpu.parallel.halo import sharded_cs_pad
        from jax.sharding import PartitionSpec as P

        mesh = create_mesh(data=1, spatial=8)
        x = _rand((1, 6, N, N, 1))
        with pytest.raises(ValueError):
            jax.shard_map(
                lambda xl: sharded_cs_pad(xl, 3, n_shards=8),  # w > h = 2
                mesh=mesh,
                in_specs=P(None, None, "spatial", None, None),
                out_specs=P(None, None, "spatial", None, None),
                check_vma=False,
            )(x)


class TestShardedModel:
    def _setup(self, seed=0):
        cfg = UNetConfig(output_channels=2, filters=(4, 8))
        model = CubeSphereUNet(cfg)
        x = _rand((4, 6, N, N, 3), seed=seed)
        params = model.init(jax.random.PRNGKey(0), x)
        return model, params, x

    def test_spatial_apply_matches_single(self, eight_devices):
        model, params, x = self._setup()
        ref = np.asarray(model.apply(params, x))
        mesh = create_mesh(data=2, spatial=4)
        fn = make_spatial_apply(model.apply, mesh)
        out = np.asarray(fn(params, x))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_dp_step_matches_single(self, eight_devices):
        cfg = UNetConfig(output_channels=2, filters=(4, 8))
        model = CubeSphereUNet(cfg)
        x = _rand((8, 6, N, N, 3), seed=0)
        params = model.init(jax.random.PRNGKey(0), x)
        y = _rand((8, 6, N, N, 2), seed=5)
        tcfg = TrainConfig(learning_rate=1e-3)
        opt = make_optimizer(tcfg)

        ref_step = make_train_step(model.apply, opt, mse)
        ref_state, ref_m = ref_step(init_state(_copy(params), opt), x, y)

        mesh = create_mesh(data=8, spatial=1)
        dp_step = make_dp_train_step(model.apply, opt, mse, mesh)
        state = init_state(_copy(params), opt)
        state, m = dp_step(state, *shard_batch((x, y), mesh))
        assert float(m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-5)
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(ref_state.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_dp_shardmap_step_matches_single(self, eight_devices):
        """shard_map DP (the variant keeping the Pallas conv eligible on
        multi-chip TPU) == single-device step == GSPMD DP."""
        from dlwp_cs_tpu.parallel.sharding import make_dp_shardmap_train_step

        cfg = UNetConfig(output_channels=2, filters=(4, 8))
        model = CubeSphereUNet(cfg)
        x = _rand((8, 6, N, N, 3), seed=0)
        params = model.init(jax.random.PRNGKey(0), x)
        y = _rand((8, 6, N, N, 2), seed=5)
        opt = make_optimizer(TrainConfig(learning_rate=1e-3))

        ref_state, ref_m = make_train_step(model.apply, opt, mse)(
            init_state(_copy(params), opt), x, y
        )
        mesh = create_mesh(data=8, spatial=1)
        sm_step = make_dp_shardmap_train_step(model.apply, opt, mse, mesh)
        state, m = sm_step(init_state(_copy(params), opt), *shard_batch((x, y), mesh))
        assert float(m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-5)
        assert float(m["grad_norm"]) == pytest.approx(
            float(ref_m["grad_norm"]), rel=1e-4
        )
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(ref_state.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_spatial_step_matches_single(self, eight_devices):
        model, params, x = self._setup()
        y = _rand((4, 6, N, N, 2), seed=5)
        tcfg = TrainConfig(learning_rate=1e-3)
        opt = make_optimizer(tcfg)

        ref_step = make_train_step(model.apply, opt, mse)
        ref_state, ref_m = ref_step(init_state(_copy(params), opt), x, y)

        mesh = create_mesh(data=2, spatial=4)
        sp_step = make_spatial_train_step(model.apply, opt, mse, mesh)
        state, m = sp_step(init_state(_copy(params), opt), x, y)
        assert float(m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-4)
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(ref_state.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_area_weighted_spatial_step_matches_single(self, eight_devices):
        """Area-weighted loss under the spatial step (VERDICT r2 weak #6):
        per-shard (weighted sum, weight sum) psum-combined must equal the
        single-device weighted mean, for loss AND parameter updates."""
        from dlwp_cs_tpu.geometry import CubedSphere
        from dlwp_cs_tpu.ops import AreaWeightedLoss

        model, params, x = self._setup()
        y = _rand((4, 6, N, N, 2), seed=5)
        loss_fn = AreaWeightedLoss("mse", CubedSphere(N).area_weights)
        tcfg = TrainConfig(learning_rate=1e-3)
        opt = make_optimizer(tcfg)

        ref_step = make_train_step(model.apply, opt, loss_fn)
        ref_state, ref_m = ref_step(init_state(_copy(params), opt), x, y)

        mesh = create_mesh(data=2, spatial=4)
        sp_step = make_spatial_train_step(model.apply, opt, loss_fn, mesh)
        state, m = sp_step(init_state(_copy(params), opt), x, y)
        assert float(m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-4)
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(ref_state.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    @pytest.mark.slow
    def test_flagship_depth_spatial_apply(self, eight_devices):
        """C48 depth-3 (32,64,128) — the production config — under
        data=2 x spatial=4: band height shrinks 12 -> 6 -> 3 across levels
        (VERDICT r1 #3: toy configs never exercised this interaction)."""
        n = 48
        cfg = UNetConfig(output_channels=4, filters=(32, 64, 128))
        model = CubeSphereUNet(cfg)
        x = _rand((2, 6, n, n, 7), seed=3)
        params = model.init(jax.random.PRNGKey(1), x)
        ref = np.asarray(model.apply(params, x))
        mesh = create_mesh(data=2, spatial=4)
        out = np.asarray(make_spatial_apply(model.apply, mesh)(params, x))
        np.testing.assert_allclose(out, ref, atol=5e-5)

    @pytest.mark.slow
    def test_flagship_depth_spatial_train_step(self, eight_devices):
        n = 48
        cfg = UNetConfig(output_channels=4, filters=(32, 64, 128))
        model = CubeSphereUNet(cfg)
        x = _rand((2, 6, n, n, 7), seed=4)
        y = _rand((2, 6, n, n, 4), seed=5)
        params = model.init(jax.random.PRNGKey(1), x)
        opt = make_optimizer(TrainConfig(learning_rate=1e-3))
        ref_state, ref_m = make_train_step(model.apply, opt, mse)(
            init_state(_copy(params), opt), x, y
        )
        mesh = create_mesh(data=2, spatial=4)
        state, m = make_spatial_train_step(model.apply, opt, mse, mesh)(
            init_state(_copy(params), opt), x, y
        )
        assert float(m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-4)
        ref_leaves = jax.tree.leaves(ref_state.params)
        for a, b in zip(jax.tree.leaves(state.params), ref_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_multi_step_training_stays_equivalent(self, eight_devices):
        model, params, x = self._setup()
        y = 0.3 * x[..., :2]
        tcfg = TrainConfig(learning_rate=1e-2)
        opt = make_optimizer(tcfg)
        ref_step = make_train_step(model.apply, opt, mse)
        mesh = create_mesh(data=2, spatial=4)
        sp_step = make_spatial_train_step(model.apply, opt, mse, mesh)
        s1 = init_state(_copy(params), opt)
        s2 = init_state(_copy(params), opt)
        for _ in range(3):
            s1, m1 = ref_step(s1, x, y)
            s2, m2 = sp_step(s2, x, y)
        assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-3)


class TestOverlapConv:
    """The overlap-friendly band ring-fix conv (parallel/overlap.py):
    interior SAME conv independent of the halo collectives + boundary
    fixes.  The default for all sharded paths; pinned here directly and
    against the pad-materializing variant."""

    @pytest.mark.parametrize("spatial", [2, 4, 8])
    def test_conv_matches_single_device(self, eight_devices, spatial):
        from jax.sharding import PartitionSpec as P

        from dlwp_cs_tpu.ops import cs_conv
        from dlwp_cs_tpu.parallel.overlap import sharded_ringfix_conv3x3

        mesh = create_mesh(data=1, spatial=spatial)
        x = _rand((2, 6, N, N, 3), seed=11)
        k_eq = _rand((3, 3, 3, 5), seed=12) * 0.2
        k_po = _rand((3, 3, 3, 5), seed=13) * 0.2
        b_eq = _rand((5,), seed=14)
        b_po = _rand((5,), seed=15)
        ref = np.asarray(
            cs_conv(x, k_eq, k_po, bias_eq=b_eq, bias_pole=b_po, backend="xla")
        )
        fn = jax.jit(
            jax.shard_map(
                lambda xl: sharded_ringfix_conv3x3(
                    xl, k_eq, k_po, b_eq, b_po, n_shards=spatial
                ),
                mesh=mesh,
                in_specs=P(None, None, "spatial", None, None),
                out_specs=P(None, None, "spatial", None, None),
                check_vma=False,
            )
        )
        np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=2e-5)

    def test_conv_grads_match_single_device(self, eight_devices):
        from jax.sharding import PartitionSpec as P

        from dlwp_cs_tpu.ops import cs_conv
        from dlwp_cs_tpu.parallel.overlap import sharded_ringfix_conv3x3

        spatial = 4
        mesh = create_mesh(data=1, spatial=spatial)
        x = _rand((1, 6, N, N, 2), seed=21)
        k_eq = _rand((3, 3, 2, 3), seed=22) * 0.2
        k_po = _rand((3, 3, 2, 3), seed=23) * 0.2

        def ref_loss(x, ke, kp):
            return jnp.mean(cs_conv(x, ke, kp, backend="xla") ** 2)

        gref = jax.grad(ref_loss, argnums=(0, 1, 2))(x, k_eq, k_po)

        def sh_loss(x, ke, kp):
            import jax as _jax
            from jax import lax

            def local(xl, ke, kp):
                out = sharded_ringfix_conv3x3(
                    xl, ke, kp, None, None, n_shards=spatial
                )
                return lax.pmean(jnp.mean(out**2), "spatial")

            return _jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(None, None, "spatial", None, None), P(), P()),
                out_specs=P(),
                check_vma=False,
            )(x, ke, kp)

        gsh = jax.grad(sh_loss, argnums=(0, 1, 2))(x, k_eq, k_po)
        for a, b in zip(gsh, gref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            )

    def test_silently_ignored_configs_rejected(self, eight_devices):
        """Round 5: configs that used to be accepted-and-ignored must
        raise — a run believing it measures the fused band kernel must
        not silently measure pad-then-VALID."""
        from dlwp_cs_tpu.parallel.sharding import sharded_model_ctx

        with pytest.raises(ValueError, match="overlap=True"):
            sharded_model_ctx(4, overlap=False, band_conv="pallas")
        with pytest.raises(ValueError, match="band_impl"):
            sharded_model_ctx(2, n_spatial_x=2, band_impl="rdma")

    def test_pad_variant_still_equivalent(self, eight_devices):
        # overlap=False pins the pad-materializing sharded path
        cfg = UNetConfig(output_channels=2, filters=(4, 8))
        model = CubeSphereUNet(cfg)
        x = _rand((4, 6, N, N, 3), seed=31)
        params = model.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(model.apply(params, x))
        mesh = create_mesh(data=2, spatial=4)
        out = np.asarray(
            make_spatial_apply(model.apply, mesh, overlap=False)(params, x)
        )
        np.testing.assert_allclose(out, ref, atol=2e-5)
