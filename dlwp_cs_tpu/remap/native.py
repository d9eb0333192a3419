"""Driver for the first-party C++ conservative remap weight generator.

Role parity with the reference's ``CubeSphereRemap`` TempestRemap wrapper
(``DLWP/remap/cubesphere.py`` — SURVEY.md §2 row 15): build/locate the native
binary, run it per (direction, grids), and load the resulting sparse map.
Unlike the reference, map *application* never goes through the binary — the
weights feed :mod:`dlwp_cs_tpu.remap.apply`'s on-device JAX contraction.

The generator's default ``method="exact"`` computes EXACT spherical
overlap areas (Sutherland-Hodgman clipping with mixed great-circle /
latitude edges — the TempestRemap-equivalent): rows sum to 1 and global
integrals/column sums are conservative to machine precision.
``method="sampled"`` keeps the first-order k x k sub-cell fallback.
"""

from __future__ import annotations

import os
import struct
import subprocess
from pathlib import Path

import numpy as np

from dlwp_cs_tpu.remap.weights import RemapWeights

__all__ = ["build_csremap", "run_csremap", "load_csremap", "conservative_weights"]

_TOOL_DIR = Path(__file__).resolve().parents[2] / "tools" / "csremap"


def build_csremap(*, force: bool = False) -> Path:
    """Compile tools/csremap (make); returns the binary path."""
    binary = _TOOL_DIR / "csremap"
    if binary.exists() and not force:
        return binary
    subprocess.run(
        ["make", "-C", str(_TOOL_DIR)] + (["--always-make"] if force else []),
        check=True,
        capture_output=True,
    )
    if not binary.exists():
        raise RuntimeError(f"build produced no binary at {binary}")
    return binary


def run_csremap(
    mode: str,
    *,
    n_lat: int,
    n_lon: int,
    n_cs: int,
    out_path,
    samples: int = 8,
    lat_centered: bool = True,
    method: str = "exact",
) -> Path:
    """Run the generator; returns the written weight file path."""
    if mode not in ("ll2cs", "cs2ll"):
        raise ValueError(f"mode must be ll2cs|cs2ll, got {mode!r}")
    binary = build_csremap()
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        [
            str(binary),
            "--mode", mode,
            "--nlat", str(n_lat),
            "--nlon", str(n_lon),
            "--ncs", str(n_cs),
            "--samples", str(samples),
            "--method", method,
            "--lat-centered", "1" if lat_centered else "0",
            "--out", str(out_path),
        ],
        check=True,
        capture_output=True,
    )
    return out_path


def load_csremap(path, dtype=np.float32) -> RemapWeights:
    """Load a CSRM binary weight file into :class:`RemapWeights`.

    ``dtype``: value precision; the file stores float64 (pass ``np.float64``
    to keep full precision, e.g. for conservation checks).
    """
    raw = Path(path).read_bytes()
    if raw[:4] != b"CSRM":
        raise ValueError(f"{path} is not a CSRM weight file")
    version, n_t, n_s = struct.unpack_from("<III", raw, 4)
    if version != 1:
        raise ValueError(f"unsupported CSRM version {version}")
    (nnz,) = struct.unpack_from("<Q", raw, 16)
    off = 24
    rows = np.frombuffer(raw, dtype="<i4", count=nnz, offset=off)
    off += 4 * nnz
    cols = np.frombuffer(raw, dtype="<i4", count=nnz, offset=off)
    off += 4 * nnz
    vals = np.frombuffer(raw, dtype="<f8", count=nnz, offset=off)
    return RemapWeights(
        rows=rows.copy(),
        cols=cols.copy(),
        vals=vals.astype(dtype),
        shape=(int(n_t), int(n_s)),
    )


def conservative_weights(
    mode: str,
    *,
    n_lat: int,
    n_lon: int,
    n_cs: int,
    samples: int = 8,
    lat_centered: bool = True,
    method: str = "exact",
    cache_dir=None,
    dtype=np.float32,
) -> RemapWeights:
    """Generate (or reuse cached) conservative weights via the C++ tool."""
    import tempfile

    cache_dir = Path(cache_dir) if cache_dir else Path(tempfile.gettempdir())
    tag = method if method != "sampled" else f"s{samples}"
    name = f"csremap_{mode}_{n_lat}x{n_lon}_c{n_cs}_{tag}_{int(lat_centered)}.bin"
    path = cache_dir / name

    def generate():
        # Atomic publication: generate under a unique tmp name, then rename.
        # The C++ tool writes the output path directly, so a crash/preempt
        # mid-generation (or two concurrent processes) would otherwise leave
        # a truncated file that poisons the cache forever.
        tmp = path.with_name(f".{name}.tmp{os.getpid()}")
        try:
            run_csremap(
                mode,
                n_lat=n_lat,
                n_lon=n_lon,
                n_cs=n_cs,
                out_path=tmp,
                samples=samples,
                lat_centered=lat_centered,
                method=method,
            )
            os.replace(tmp, path)
        finally:
            tmp.unlink(missing_ok=True)

    if not path.exists():
        generate()
    try:
        return load_csremap(path, dtype=dtype)
    except (ValueError, struct.error, EOFError):
        # corrupt/truncated cache entry (a crash can cut the file anywhere,
        # incl. inside the fixed-size header, which raises struct.error
        # rather than ValueError): regenerate once
        path.unlink(missing_ok=True)
        generate()
        return load_csremap(path, dtype=dtype)
