"""Honest re-measurement of the halo machinery's pieces (differenced chains).

tools/bwd_micro.py's corrected methodology revealed that XLA's plain
UNPACKED SAME conv at the U-Net's outer level (n=48, c=32) runs ~2x faster
than the block-diagonal batch->lane packed conv (49 vs 91 us) — the packing
story was calibrated against the Pallas kernel's 9-tap dots and against
noisy micro timings.  This tool re-times every piece of the ring-fix
formulation with the robust methodology so the round-3 formulation decision
(XLA conv + cheap ring vs packed Pallas kernel) rests on real numbers:

  same        zero-pad SAME conv (both weight groups, model-shaped)
  ext         halo.ext_strips alone (the one gather)
  ring        ops.ringfix.ring_term alone (windows + fix dots + masked add)
  ringfix     the full fused conv (same + ring)
  pallas      the production fused Pallas conv (its internal packing incl.)
each x {fwd, vjp} x {unpacked, packed} where applicable.

Run ON TPU: ``python tools/halo_micro.py``.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from _timing import diff_chain_time_us
from dlwp_cs_tpu.ops import packing
from dlwp_cs_tpu.ops.pallas_conv import cs_conv3x3_pallas
from dlwp_cs_tpu.ops.ringfix import (
    cs_conv3x3_ringfix,
    ring_term,
    use_packed_base,
)
from dlwp_cs_tpu.ops.halo import ext_strips

B = 16
SHAPES = [(48, 32, 32), (48, 96, 32), (24, 64, 64)]


def main() -> int:
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for n, cin, cout in SHAPES:
        x = jnp.asarray(
            rng.normal(size=(B, 6, n, n, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ke = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
        ).astype(jnp.bfloat16) * 0.05
        kp = ke * 0.9
        g = jnp.asarray(
            rng.normal(size=(B, 6, n, n, cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        zb = jnp.zeros((cout,), x.dtype)
        p = packing.pack_factor(B, cin, cout)
        useful = 2 * B * 6 * n * n * 9 * cin * cout
        print(f"-- n={n} cin={cin} cout={cout} pack={p}", flush=True)

        def xc(c):
            return x + c.astype(x.dtype)

        def gc(c):
            return g + c.astype(g.dtype)

        def row(name, fn, mult=1.0):
            t = diff_chain_time_us(fn)
            tf = useful * mult / (t * 1e-6) / 1e12 if mult else float("nan")
            extra = f"  {tf:6.1f} TF/s useful" if mult else ""
            print(f"  {name:22s} {t:8.1f} us{extra}", flush=True)

        # the one gather: corner-extended ghost strips
        row("ext/unpacked", lambda c: ext_strips(xc(c)), mult=0)
        if p > 1:
            row(
                "ext/packed",
                lambda c: ext_strips(packing.pack_batch(xc(c), p)),
                mult=0,
            )
        # ring term alone (unpacked)
        row("ring/unpacked", lambda c: ring_term(xc(c), ke, kp), mult=0)

        # full ring-fix conv, packed (production backward layout) and
        # unpacked (the XLA-conv-favoring candidate); vjp over (x, ke, kp)
        # — the pieces the training backward runs
        def rf(v, kke, kkp, flag):
            with use_packed_base(flag):
                return cs_conv3x3_ringfix(v, kke, kkp)

        for flag, tag in ((False, "unpacked"), (True, "packed")):
            row(f"ringfix/{tag}",
                lambda c, f=flag: rf(xc(c), ke, kp, f))
            row(
                f"ringfix/{tag} vjp",
                lambda c, f=flag: jax.vjp(
                    lambda v, a, b: rf(v, a, b, f), xc(c), ke, kp
                )[1](gc(c)),
                mult=2,
            )
        # production Pallas conv (internal per-conv packing incl. transposes)
        row("pallas/fwd", lambda c: cs_conv3x3_pallas(xc(c), ke, kp, zb, zb))

        # ---- ring_term dissection: fixes computation vs masked-add apply --
        # (which of the two holds ring_term's cost decides whether a Pallas
        # ring kernel or an application rewrite is the right fix)
        ext0 = ext_strips(x)

        def fixes_of(ext):
            b_, nf, _, np2, cc = ext.shape
            nn = np2 - 2
            win = jnp.stack(
                [ext[..., 0:nn, :], ext[..., 1:nn + 1, :], ext[..., 2:nn + 2, :]],
                axis=-2,
            ).reshape(b_, 6, 4, nn, 3 * cc)

            def edge_taps(k):
                return jnp.stack(
                    [k[0].reshape(3 * cin, -1), k[2].reshape(3 * cin, -1),
                     k[:, 0].reshape(3 * cin, -1), k[:, 2].reshape(3 * cin, -1)],
                    axis=0,
                )

            def group_fix(win_g, taps_g):
                return jax.lax.dot_general(
                    win_g, taps_g.astype(win_g.dtype),
                    dimension_numbers=(((4,), (1,)), ((2,), (0,))),
                )

            fe = group_fix(win[:, :4], edge_taps(ke))
            fp = group_fix(win[:, 4:], edge_taps(kp))
            return jnp.concatenate([fe, fp], axis=2)  # (4, B, 6, n, D)

        row("ring/fixes-only", lambda c: fixes_of(ext0 + c.astype(x.dtype)),
            mult=0)
        fixes0 = fixes_of(ext0)
        base0 = jnp.zeros((B, 6, n, n, cout), x.dtype)

        def apply_of(c):
            fx = fixes0 + c.astype(x.dtype)
            row_i = jax.lax.broadcasted_iota(
                jnp.int32, (n, n), 0)[None, None, :, :, None]
            col_i = jax.lax.broadcasted_iota(
                jnp.int32, (n, n), 1)[None, None, :, :, None]
            zero = jnp.zeros((), x.dtype)
            return (
                base0
                + jnp.where(row_i == 0, fx[0][:, :, None, :, :], zero)
                + jnp.where(row_i == n - 1, fx[1][:, :, None, :, :], zero)
                + jnp.where(col_i == 0, fx[2][:, :, :, None, :], zero)
                + jnp.where(col_i == n - 1, fx[3][:, :, :, None, :], zero)
            )

        row("ring/apply-only", lambda c: apply_of(c), mult=0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
