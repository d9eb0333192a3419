"""2-D fused tile conv (parallel/pallas_tile.py): the fused VMEM kernel on
the row x column tiling, equivalence-pinned against the single-device conv
on the 8-device CPU mesh (VERDICT r4 next #7 — the 1-D/2-D fused-path
asymmetry)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from dlwp_cs_tpu.models import CubeSphereUNet, UNetConfig
from dlwp_cs_tpu.ops import cs_conv
from dlwp_cs_tpu.parallel import create_mesh, make_spatial_apply
from dlwp_cs_tpu.parallel.pallas_tile import (
    make_tile_pallas_conv3x3,
    tile_conv3x3_pallas,
    tile_pallas_supported,
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


def _specs(extra=0):
    tile = P(None, None, "spatial", "spatial_x", None)
    return tile


@pytest.mark.parametrize("sy,sx", [(2, 2), (4, 2), (2, 4)])
def test_tile_conv_matches_single_device(eight_devices, sy, sx):
    if sy * sx > 8:
        pytest.skip("needs more devices")
    mesh = create_mesh(data=1, spatial=sy, spatial_x=sx)
    x = _rand((2, 6, N, N, 3), seed=41)
    k_eq = _rand((3, 3, 3, 5), seed=42) * 0.2
    k_po = _rand((3, 3, 3, 5), seed=43) * 0.2
    b_eq = _rand((5,), seed=44)
    b_po = _rand((5,), seed=45)
    ref = np.asarray(
        cs_conv(x, k_eq, k_po, bias_eq=b_eq, bias_pole=b_po, backend="xla")
    )
    h, wl = N // sy, N // sx
    if h > wl:
        # ext-layout constraint: the closure must FALL BACK, still exact
        conv = make_tile_pallas_conv3x3(sy, sx, interpret=True)
        fn = jax.jit(
            jax.shard_map(
                lambda xl: conv(xl, k_eq, k_po, b_eq, b_po),
                mesh=mesh,
                in_specs=_specs(),
                out_specs=_specs(),
                check_vma=False,
            )
        )
    else:
        fn = jax.jit(
            jax.shard_map(
                lambda xl: tile_conv3x3_pallas(
                    xl, k_eq, k_po, b_eq, b_po, "spatial", "spatial_x",
                    sy, sx, True
                ),
                mesh=mesh,
                in_specs=_specs(),
                out_specs=_specs(),
                check_vma=False,
            )
        )
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=2e-5)


def test_tile_conv_grads_match_single_device(eight_devices):
    sy = sx = 2
    mesh = create_mesh(data=1, spatial=sy, spatial_x=sx)
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
            out = tile_conv3x3_pallas(
                xl, ke, kp, be, bp, "spatial", "spatial_x", sy, sx, True
            )
            return lax.pmean(
                lax.pmean(jnp.mean(out**2), "spatial"), "spatial_x"
            )

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(_specs(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(x, ke, kp, be, bp)

    gsh = jax.jit(jax.grad(sh_loss, argnums=(0, 1, 2, 3, 4)))(
        x, k_eq, k_po, b_eq, b_po
    )
    for a, b in zip(gsh, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_model_forward_tile_pallas(eight_devices):
    """Full U-Net forward on the 2-D mesh with band_conv='pallas_interpret'
    (every supported 3x3 through the tile kernel; others pad-then-VALID)."""
    cfg = UNetConfig(output_channels=2, filters=(4, 8))
    model = CubeSphereUNet(cfg)
    x = _rand((2, 6, N, N, 3), seed=61)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))
    mesh = create_mesh(data=2, spatial=2, spatial_x=2)
    fn = make_spatial_apply(model.apply, mesh, band_conv="pallas_interpret")
    np.testing.assert_allclose(np.asarray(fn(params, x)), ref, atol=3e-5)


def test_2d_ctx_rejects_band_only_modes(eight_devices):
    """The 2-D tiling must raise on band-only/typo'd band_conv values, not
    silently fall back to pad-then-VALID (round-5 review finding)."""
    mesh = create_mesh(data=2, spatial=2, spatial_x=2)
    model = CubeSphereUNet(UNetConfig(output_channels=2, filters=(4, 8)))
    for bad in ("overlap", "overlap_interpret", "palas"):
        with pytest.raises(ValueError, match="not available on the 2-D"):
            make_spatial_apply(model.apply, mesh, band_conv=bad)


def test_supported_gate():
    f32 = jnp.float32
    assert tile_pallas_supported((2, 6, N // 2, N // 2, 3), 2, 2, f32)
    assert tile_pallas_supported((2, 6, N // 4, N // 2, 3), 4, 2, f32)
    # h > wl: ext layout cannot carry the W/E strips
    assert not tile_pallas_supported((2, 6, N // 2, N // 4, 3), 2, 4, f32)
    # inconsistent tiling / f64
    assert not tile_pallas_supported((2, 6, 3, N // 2, 3), 2, 2, f32)
    assert not tile_pallas_supported(
        (2, 6, N // 2, N // 2, 3), 2, 2, jnp.float64
    )
    # channel-expanding conv past the VMEM budget: the gate must use the
    # REAL cout (and its f32 accumulation stack), not assume cout == cin —
    # regression for the round-4 full-face-gate bug, round-5 tile variant
    big = (1, 6, 48, 96, 32)
    assert tile_pallas_supported(big, 4, 2, jnp.bfloat16)
    assert not tile_pallas_supported(big, 4, 2, jnp.bfloat16, cout=512)