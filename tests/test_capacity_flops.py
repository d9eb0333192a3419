"""Pin the analytic train-step FLOP counter used by bench.py and
tools/capacity_bench.py (they must stay in sync — the %-of-peak claims in
PERF.md hang off this count)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from capacity_bench import unet_train_flops  # noqa: E402


def _explicit_flagship_flops(batch=16, n=48, in_ch=12, out_ch=8):
    """Independent per-layer enumeration of the flagship C48 (32, 64, 128)
    U-Net's conv MACs: encoder 2 convs/level, bottleneck pair at the last
    level, decoder (concat-conv + conv)/level, 1x1 head; x2 MAC->FLOP,
    x3 fwd+bwd."""
    layers = [
        (48, in_ch, 32), (48, 32, 32),          # encoder level 0
        (24, 32, 64), (24, 64, 64),             # encoder level 1
        (12, 64, 128), (12, 128, 128),          # bottleneck
        (24, 128 + 64, 64), (24, 64, 64),       # decoder level 1
        (48, 64 + 32, 32), (48, 32, 32),        # decoder level 0
    ]
    fwd = sum(2 * batch * 6 * s * s * 9 * ci * co for s, ci, co in layers)
    fwd += 2 * batch * 6 * n * n * 32 * out_ch  # 1x1 head
    return 3.0 * fwd


def test_flagship_flops_match_explicit_enumeration():
    got = unet_train_flops(48, (32, 64, 128), 16, 12, 8)
    want = _explicit_flagship_flops()
    assert got == want


def test_bench_py_counter_matches():
    """bench.py's inline counter (nested in main) must agree: execute the
    flagship count through a tiny smoke parse of its source to avoid a
    refactor of the driver artifact."""
    import re

    src = (Path(__file__).resolve().parents[1] / "bench.py").read_text()
    # The inline counter and capacity_bench differ only in how parameters
    # arrive; check the load-bearing expressions are literally shared.
    for expr in (
        "2 * batch * 6 * s * s * 9 * ci * co",
        "convs += [(sizes[-1], cin, filters[-1]), (sizes[-1], filters[-1], filters[-1])]",
        "return 3.0 * fwd",
    ):
        assert expr in src, f"bench.py counter drifted: {expr!r} missing"
