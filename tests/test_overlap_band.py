"""M6 overlap kernel (parallel/overlap_band.py): the fused band conv whose
band-row halo rides in-kernel async remote copies, interior taps computed
while the transfers are in flight.  Equivalence-pinned in interpret mode on
the 8-device CPU mesh against the single-device conv (SURVEY.md §7 M6,
§4.2/§4.4); real-ICI overlap measurement needs multi-chip hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from dlwp_cs_tpu.models import CubeSphereUNet, UNetConfig
from dlwp_cs_tpu.ops import cs_conv
from dlwp_cs_tpu.parallel import create_mesh, make_spatial_apply
from dlwp_cs_tpu.parallel.overlap_band import (
    band_conv3x3_overlap,
    make_overlap_conv3x3,
    overlap_supported,
)

N = 16


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


@pytest.mark.parametrize("spatial", [2, 4, 8])
def test_overlap_conv_matches_single_device(eight_devices, spatial):
    mesh = create_mesh(data=1, spatial=spatial)
    x = _rand((2, 6, N, N, 3), seed=41)
    k_eq = _rand((3, 3, 3, 5), seed=42) * 0.2
    k_po = _rand((3, 3, 3, 5), seed=43) * 0.2
    b_eq = _rand((5,), seed=44)
    b_po = _rand((5,), seed=45)
    ref = np.asarray(
        cs_conv(x, k_eq, k_po, bias_eq=b_eq, bias_pole=b_po, backend="xla")
    )
    fn = jax.jit(
        jax.shard_map(
            lambda xl: band_conv3x3_overlap(
                xl, k_eq, k_po, b_eq, b_po, "spatial", spatial, True
            ),
            mesh=mesh,
            in_specs=P(None, None, "spatial", None, None),
            out_specs=P(None, None, "spatial", None, None),
            check_vma=False,
        )
    )
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=2e-5)


def test_overlap_conv_many_channels_packs(eight_devices):
    """A batch big enough to trigger batch->lane packing inside the kernel."""
    spatial = 4
    mesh = create_mesh(data=1, spatial=spatial)
    x = _rand((8, 6, N, N, 4), seed=46)
    k_eq = _rand((3, 3, 4, 4), seed=47) * 0.2
    k_po = _rand((3, 3, 4, 4), seed=48) * 0.2
    zb = jnp.zeros((4,), jnp.float32)
    ref = np.asarray(cs_conv(x, k_eq, k_po, backend="xla"))
    fn = jax.jit(
        jax.shard_map(
            lambda xl: band_conv3x3_overlap(
                xl, k_eq, k_po, zb, zb, "spatial", spatial, True
            ),
            mesh=mesh,
            in_specs=P(None, None, "spatial", None, None),
            out_specs=P(None, None, "spatial", None, None),
            check_vma=False,
        )
    )
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=2e-5)


def test_overlap_conv_grads_match_single_device(eight_devices):
    spatial = 4
    mesh = create_mesh(data=1, spatial=spatial)
    x = _rand((1, 6, N, N, 2), seed=51)
    k_eq = _rand((3, 3, 2, 3), seed=52) * 0.2
    k_po = _rand((3, 3, 2, 3), seed=53) * 0.2
    b_eq = _rand((3,), seed=54)
    b_po = _rand((3,), seed=55)

    def ref_loss(x, ke, kp, be, bp):
        return jnp.mean(
            cs_conv(x, ke, kp, bias_eq=be, bias_pole=bp, backend="xla") ** 2
        )

    gref = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(
        x, k_eq, k_po, b_eq, b_po
    )

    def sh_loss(x, ke, kp, be, bp):
        def local(xl, ke, kp, be, bp):
            out = band_conv3x3_overlap(
                xl, ke, kp, be, bp, "spatial", spatial, True
            )
            return lax.pmean(jnp.mean(out**2), "spatial")

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, None, "spatial", None, None), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(x, ke, kp, be, bp)

    # NOTE: the grad MUST be jitted: eager shard_map transposition
    # re-executes the body per shard sequentially, which deadlocks the
    # kernel's cross-shard barrier (overlap_band.py docstring).  Under jit
    # the whole program compiles per device and all shards run
    # concurrently — as on real hardware.
    gsh = jax.jit(jax.grad(sh_loss, argnums=(0, 1, 2, 3, 4)))(
        x, k_eq, k_po, b_eq, b_po
    )
    for a, b in zip(gsh, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_model_forward_overlap(eight_devices):
    """Full U-Net forward with band_conv='overlap_interpret' (every
    3x3/stride-1 layer through the overlap kernel; unsupported levels fall
    back to the band ring-fix)."""
    cfg = UNetConfig(output_channels=2, filters=(4, 8))
    model = CubeSphereUNet(cfg)
    x = _rand((2, 6, N, N, 3), seed=61)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))
    mesh = create_mesh(data=2, spatial=4)
    fn = make_spatial_apply(
        model.apply, mesh, band_conv="overlap_interpret"
    )
    np.testing.assert_allclose(np.asarray(fn(params, x)), ref, atol=3e-5)


def test_supported_gate():
    assert not overlap_supported((2, 6, N, N, 3), 1, jnp.float32)  # 1 shard
    assert not overlap_supported((2, 6, 3, N, 3), 4, jnp.float32)  # mismatch
    assert not overlap_supported((2, 6, N // 4, N, 3), 4, jnp.float64)
    assert overlap_supported((2, 6, N // 4, N, 3), 4, jnp.float32)


def test_fallback_closure_runs_on_unsupported(eight_devices):
    """The closure falls back to the band ring-fix for f64 inputs."""
    spatial = 2
    mesh = create_mesh(data=1, spatial=spatial)
    x = _rand((1, 6, N, N, 2), seed=71)
    k_eq = _rand((3, 3, 2, 2), seed=72) * 0.2
    k_po = _rand((3, 3, 2, 2), seed=73) * 0.2
    conv = make_overlap_conv3x3(spatial, interpret=True)
    ref = np.asarray(cs_conv(x, k_eq, k_po, backend="xla"))
    fn = jax.jit(
        jax.shard_map(
            lambda xl: conv(xl, k_eq, k_po, None, None),
            mesh=mesh,
            in_specs=P(None, None, "spatial", None, None),
            out_specs=P(None, None, "spatial", None, None),
            check_vma=False,
        )
    )
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=2e-5)
