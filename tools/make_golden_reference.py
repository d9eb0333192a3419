#!/usr/bin/env python
"""Extract golden tensors from the reference implementation
(SURVEY.md Appendix C step 4 — runnable only once ``/root/reference`` holds
the upstream DLWP-CS source; the mount is empty as of round 2, SURVEY.md §0).

Produces the npz contract consumed by ``dlwp_cs_tpu.verify.oracle``:
``lonlat`` (reference cell-center lon/lat per face, so the face relabeling is
recovered empirically), plus pad and conv input/output pairs computed by the
reference's ``CubeSpherePadding2D`` / ``CubeSphereConv2D`` with fixed seeds.

Usage:  python tools/make_golden_reference.py [--n 24] [--out tests/golden/reference_c24.npz]

The reference layers are TF/Keras; TF 2.21 is available in this image, so
once the mount returns this script runs as-is modulo the exact upstream
symbol names (marked # UPSTREAM below — verify against the real tree per
Appendix C step 2 before trusting the output).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--out", default="tests/golden/reference_c24.npz")
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--filters", type=int, default=4)
    args = ap.parse_args()

    if not any(REFERENCE.glob("**/*.py")):
        print(
            f"reference mount {REFERENCE} is empty — nothing to extract.\n"
            "When it is restored, re-run this script (SURVEY.md Appendix C)."
        )
        return 1

    sys.path.insert(0, str(REFERENCE))
    # UPSTREAM: symbol locations per SURVEY.md §2 rows 1-2; verify on the
    # real tree (DLWP/custom.py) before use.
    from DLWP.custom import CubeSphereConv2D, CubeSpherePadding2D  # noqa: E501

    import tensorflow as tf

    n, c, co = args.n, args.channels, args.filters
    rng = np.random.default_rng(0)

    # The reference's face-local cell-center lon/lat.  UPSTREAM: adapt to
    # however the reference exposes its grid (TempestRemap mesh files or a
    # remapped coordinate field); the only requirement is (6, n, n, 2) deg.
    lonlat = _reference_lonlat(n)

    # Reference tensors are (B, 6, H, W, C) per SURVEY §2 row 1.
    x_pad = rng.normal(size=(2, 6, n, n, c)).astype(np.float32)
    pad = CubeSpherePadding2D(1)
    pad_out = pad(tf.constant(x_pad)).numpy()

    x_conv = rng.normal(size=(2, 6, n, n, c)).astype(np.float32)
    conv = CubeSphereConv2D(co, 3)  # UPSTREAM: constructor signature
    conv.build(x_conv.shape)
    k_eq, k_po, b_eq, b_po = _extract_conv_weights(conv)
    conv_out = conv(tf.constant(x_conv)).numpy()

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        out,
        lonlat=lonlat,
        pad_in=x_pad,
        pad_out=pad_out,
        pad_width=np.int64(1),
        conv_in=x_conv,
        conv_kernel_eq=k_eq,
        conv_kernel_pole=k_po,
        conv_bias_eq=b_eq,
        conv_bias_pole=b_po,
        conv_out=conv_out,
    )
    print(f"wrote {out}")
    return 0


def _reference_lonlat(n: int) -> np.ndarray:
    """UPSTREAM: replace with the reference's own grid coordinates.  Until
    the mount returns there is no way to know its convention — that is the
    entire point of extracting this field from the reference itself."""
    raise NotImplementedError(
        "fill in from the restored reference (SURVEY.md Appendix C step 2)"
    )


def _extract_conv_weights(conv):
    """UPSTREAM: map the reference layer's weight variables to
    (kernel_eq, kernel_pole, bias_eq, bias_pole) HWIO numpy arrays."""
    raise NotImplementedError(
        "inspect CubeSphereConv2D.weights on the restored reference"
    )


if __name__ == "__main__":
    raise SystemExit(main())
