"""Shard-local fused Pallas band conv (parallel/pallas_band.py): the
spatially decomposed path's VMEM kernel, equivalence-pinned against the
single-device conv and the band ring-fix formulation on the virtual
8-device CPU mesh (interpret mode — SURVEY.md §4.2/§4.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from dlwp_cs_tpu.models import CubeSphereUNet, UNetConfig
from dlwp_cs_tpu.ops import cs_conv
from dlwp_cs_tpu.parallel import create_mesh, make_spatial_apply
from dlwp_cs_tpu.parallel.pallas_band import (
    band_conv3x3_pallas,
    band_pallas_supported,
    make_sharded_pallas_conv3x3,
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
def test_band_conv_matches_single_device(eight_devices, spatial):
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
            lambda xl: band_conv3x3_pallas(
                xl, k_eq, k_po, b_eq, b_po, "spatial", spatial, True
            ),
            mesh=mesh,
            in_specs=P(None, None, "spatial", None, None),
            out_specs=P(None, None, "spatial", None, None),
            check_vma=False,
        )
    )
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=2e-5)


def test_band_conv_grads_match_single_device(eight_devices):
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
            out = band_conv3x3_pallas(
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

    gsh = jax.grad(sh_loss, argnums=(0, 1, 2, 3, 4))(x, k_eq, k_po, b_eq, b_po)
    for a, b in zip(gsh, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_model_forward_band_pallas(eight_devices):
    """Full U-Net forward with band_conv='pallas_interpret' (every
    3x3/stride-1 layer through the band kernel; thin/unsupported levels
    fall back to the band ring-fix)."""
    cfg = UNetConfig(output_channels=2, filters=(4, 8))
    model = CubeSphereUNet(cfg)
    x = _rand((2, 6, N, N, 3), seed=61)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))
    mesh = create_mesh(data=2, spatial=4)
    fn = make_spatial_apply(
        model.apply, mesh, band_conv="pallas_interpret"
    )
    np.testing.assert_allclose(np.asarray(fn(params, x)), ref, atol=3e-5)


def test_supported_gate():
    # thin bands and mismatched shards are rejected (the closure then
    # falls back to the band ring-fix conv)
    assert band_pallas_supported((2, 6, 4, 16, 8), 4, jnp.float32)
    assert not band_pallas_supported((2, 6, 4, 16, 8), 3, jnp.float32)
    assert not band_pallas_supported((2, 6, 1, 2, 8), 2, jnp.float32)
    assert not band_pallas_supported((2, 6, 4, 16, 8), 4, jnp.float64)


def test_closure_fallback_unsupported_dtype(eight_devices):
    """f64 local blocks take the ring-fix fallback inside the closure and
    still match the single-device conv."""
    spatial = 2
    mesh = create_mesh(data=1, spatial=spatial)
    x = _rand((1, 6, N, N, 2), seed=71).astype(jnp.float64)
    k_eq = (_rand((3, 3, 2, 3), seed=72) * 0.2).astype(jnp.float64)
    k_po = (_rand((3, 3, 2, 3), seed=73) * 0.2).astype(jnp.float64)
    conv = make_sharded_pallas_conv3x3(spatial, interpret=True)
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
