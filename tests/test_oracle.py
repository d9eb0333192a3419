"""Face-relabeling shim + allclose-oracle harness tests (SURVEY.md Appendix A
step 4 / Appendix C step 4).

The reference mount is empty, so the oracle is exercised against *fabricated*
golden files: our own ops' outputs re-expressed in a scrambled face
convention (random permutation + per-group D4 orientation).  This pins the
entire recovery path — empirical relabeling inference from coordinates,
inversion, tensor relabeling, kernel-group rotation, pad/conv comparison —
so the real reference golden (tools/make_golden_reference.py) slots in with
zero code changes.  If a real golden file exists it is tested too.
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from dlwp_cs_tpu.ops.conv import cs_conv
from dlwp_cs_tpu.ops.padding import cs_pad
from dlwp_cs_tpu.verify.oracle import (
    OracleReport,
    _group_kernel,
    compare_to_golden,
    our_lonlat,
)
from dlwp_cs_tpu.verify.relabel import (
    D4_ELEMENTS,
    FaceRelabeling,
    apply_relabeling,
    infer_relabeling,
    invert_relabeling,
)

N = 8

# A realistic convention difference: equatorial faces cycled and uniformly
# rotated, poles swapped with a transpose-flip orientation.
SCRAMBLE = FaceRelabeling(
    perm=(1, 2, 3, 0, 5, 4),
    orient=((1, False),) * 4 + ((2, True),) * 2,
)


def _smooth_field(n=N, c=2, seed=0):
    """Smooth non-symmetric multi-channel field from cell coordinates."""
    ll = our_lonlat(n)
    lon, lat = np.deg2rad(ll[..., 0]), np.deg2rad(ll[..., 1])
    # must have NO exact symmetry: the sin(lon) terms break the lon -> -lon
    # mirror that would otherwise make faces 1 and 3 indistinguishable.
    f = np.stack(
        [
            np.sin(lat)
            + 0.5 * np.cos(lon) * np.cos(lat)
            + 0.25 * np.sin(lon) * np.cos(lat),
            np.cos(2 * lon) * np.cos(lat) ** 2
            + 0.3 * np.sin(lat)
            + 0.2 * np.sin(lon) * np.cos(lat) ** 2,
        ],
        axis=-1,
    )[..., :c]
    rng = np.random.default_rng(seed)
    return (f + 0.01 * rng.normal(size=f.shape)).astype(np.float64)


class TestRelabeling:
    def test_apply_invert_roundtrip(self):
        x = np.random.default_rng(0).normal(size=(3, 6, N, N, 2))
        there = apply_relabeling(x, SCRAMBLE)
        back = apply_relabeling(there, invert_relabeling(SCRAMBLE))
        np.testing.assert_array_equal(back, x)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_infer_recovers_random_mapping(self, seed):
        rng = np.random.default_rng(seed)
        perm = tuple(rng.permutation(6).tolist())
        orient = tuple(D4_ELEMENTS[i] for i in rng.integers(0, 8, size=6))
        mapping = FaceRelabeling(perm=perm, orient=orient)
        field = _smooth_field(seed=seed)
        theirs = apply_relabeling(field, mapping)
        got = infer_relabeling(field, theirs)
        assert got == mapping

    def test_symmetric_field_rejected(self):
        const = np.ones((6, N, N))
        with pytest.raises(ValueError, match="ambiguous|degenerate"):
            infer_relabeling(const, const)

    def test_json_roundtrip(self):
        back = FaceRelabeling.from_json(SCRAMBLE.to_json())
        assert back == SCRAMBLE


def _fake_golden(tmp_path, *, d4_symmetric_kernels: bool,
                 scramble: FaceRelabeling = SCRAMBLE) -> Path:
    """Fabricate a golden npz in the SCRAMBLE convention from our own ops."""
    rng = np.random.default_rng(3)
    n, c, co = N, 3, 4
    lonlat_ref = apply_relabeling(our_lonlat(n), scramble)

    x = rng.normal(size=(2, 6, n, n, c)).astype(np.float32)
    pad_out = np.asarray(cs_pad(jnp.asarray(x), 1))

    k_eq = rng.normal(size=(3, 3, c, co)).astype(np.float32) * 0.2
    k_po = rng.normal(size=(3, 3, c, co)).astype(np.float32) * 0.2
    if d4_symmetric_kernels:
        # average over the 8 plane isometries -> kernel invariant under any
        # orientation offset, making the conv golden fully implementation-
        # independent (no shared helper between generation and oracle).
        def sym(k):
            acc = np.zeros_like(k)
            for kk, flip in D4_ELEMENTS:
                t = np.rot90(k, kk, axes=(0, 1))
                if flip:
                    t = np.swapaxes(t, 0, 1)
                acc += t
            return (acc / 8).astype(np.float32)

        k_eq, k_po = sym(k_eq), sym(k_po)
        k_eq_ref, k_po_ref = k_eq, k_po
    else:
        # generic kernels: express them in the reference convention by the
        # inverse group rotation (the oracle rotates them back).
        inv = invert_relabeling(scramble)

        def unrotate(k, our_faces):
            d = {inv.orient[scramble.perm[f]] for f in our_faces}
            (kk, flip), = d
            out = k
            if flip:
                out = np.swapaxes(out, 0, 1)
            out = np.rot90(out, -kk, axes=(0, 1))
            return np.ascontiguousarray(out)

        k_eq_ref = unrotate(k_eq, range(4))
        k_po_ref = unrotate(k_po, range(4, 6))

    b_eq = rng.normal(size=(co,)).astype(np.float32)
    b_po = rng.normal(size=(co,)).astype(np.float32)
    conv_out = np.asarray(
        cs_conv(
            jnp.asarray(x),
            jnp.asarray(k_eq),
            jnp.asarray(k_po),
            bias_eq=jnp.asarray(b_eq),
            bias_pole=jnp.asarray(b_po),
            backend="xla",
        )
    )

    path = tmp_path / "golden.npz"
    np.savez(
        path,
        lonlat=lonlat_ref,
        pad_in=apply_relabeling(x, scramble),
        pad_out=apply_relabeling(pad_out, scramble),
        pad_width=np.int64(1),
        conv_in=apply_relabeling(x, scramble),
        conv_kernel_eq=k_eq_ref,
        conv_kernel_pole=k_po_ref,
        conv_bias_eq=b_eq,
        conv_bias_pole=b_po,
        conv_out=apply_relabeling(conv_out, scramble),
    )
    return path


class TestOracle:
    def test_recovers_convention_and_passes(self, tmp_path):
        report = compare_to_golden(_fake_golden(tmp_path, d4_symmetric_kernels=True))
        assert report.relabeling == SCRAMBLE
        assert report.lonlat_err_deg < 1e-10
        assert report.pad_err < 1e-6
        assert report.conv_err < 1e-5
        assert report.ok()

    def test_generic_kernel_group_rotation(self, tmp_path):
        report = compare_to_golden(_fake_golden(tmp_path, d4_symmetric_kernels=False))
        assert report.conv_err < 1e-5

    def test_pole_axis_change_rejected(self, tmp_path):
        """Round 5: a relabeling that maps our equatorial faces onto the
        reference's pole faces must raise the structural error — even with
        uniform orientation offsets, eq/polar weight groups cannot be
        shared across different pole axes."""
        poleswap = FaceRelabeling(
            perm=(4, 1, 2, 3, 0, 5), orient=((0, False),) * 6
        )
        path = _fake_golden(
            tmp_path, d4_symmetric_kernels=True, scramble=poleswap
        )
        with pytest.raises(ValueError, match="different pole axes"):
            compare_to_golden(path)

    def test_detects_wrong_numerics(self, tmp_path):
        path = _fake_golden(tmp_path, d4_symmetric_kernels=True)
        with np.load(path) as z:
            data = {k: z[k] for k in z.files}
        data["conv_out"] = data["conv_out"] + 0.1
        np.savez(path, **data)
        report = compare_to_golden(path)
        assert report.conv_err > 0.05
        assert not report.ok()


REAL_GOLDEN = Path(__file__).parent / "golden" / "reference_c24.npz"


@pytest.mark.skipif(
    not REAL_GOLDEN.exists(),
    reason="reference mount empty — run tools/make_golden_reference.py "
    "when /root/reference is restored (SURVEY.md Appendix C)",
)
def test_reference_golden():
    report = compare_to_golden(REAL_GOLDEN)
    assert report.ok(atol=1e-4), report
