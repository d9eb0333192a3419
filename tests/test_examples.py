"""End-to-end integration: run the example workflow scripts (tiny sizes).

The examples are the de-facto CLI (SURVEY.md §2 row 20); this test drives
the full dataset -> train -> forecast -> evaluate chain as subprocesses the
way a user would, against a temp workdir.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _run(script, *args, devices: int = 1):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["MPLBACKEND"] = "Agg"
    env["PYTHONPATH"] = str(REPO)
    if devices > 1:
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / script), *args],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


@pytest.mark.slow
def test_full_example_chain(tmp_path):
    wd = str(tmp_path)
    _run(
        "01_build_dataset.py",
        "--workdir", wd, "--grid", "16", "--nlat", "32", "--nlon", "64",
        "--days", "40",
    )
    assert (tmp_path / "predictors_cs.h5").exists()
    _run(
        "02_train.py",
        "--workdir", wd, "--epochs", "2", "--batch", "8",
        "--filters", "4", "8", "--lr", "2e-3",
    )
    assert (tmp_path / "model" / "experiment.json").exists()
    _run("03_forecast.py", "--workdir", wd, "--days", "2", "--inits", "2")
    fz = np.load(tmp_path / "forecast.npz", allow_pickle=True)
    assert fz["fields"].shape[0] == 2
    out = _run("04_evaluate.py", "--workdir", wd)
    assert "RMSE" in out
    assert (tmp_path / "rmse_curves.png").exists()
    # metrics jsonl written by the trainer
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    kinds = {json.loads(l)["kind"] for l in lines}
    assert kinds == {"step", "epoch"}
    # 05: sequence fine-tuning, single-device then under a 2x2 mesh
    out = _run(
        "05_sequence_train.py",
        "--workdir", wd, "--sequence", "2", "--steps", "4", "--batch", "4",
        "--filters", "4",
    )
    assert "final sequence loss" in out
    out = _run(
        "05_sequence_train.py",
        "--workdir", wd, "--sequence", "2", "--steps", "4", "--batch", "4",
        "--filters", "4", "--mesh", "2x2",
        devices=4,
    )
    assert "mesh: data=2 x spatial=2" in out
    assert "final sequence loss" in out
    # 06: serving — HTTP server + concurrent client requests
    out = _run("06_serve.py", "--workdir", wd, "--selftest", "--steps", "2")
    assert "selftest ok" in out
    assert "requests=3" in out
    # 07: ensemble forecast + AOT export round trip
    out = _run(
        "07_ensemble_export.py",
        "--workdir", wd, "--members", "4", "--steps", "2",
    )
    assert "ensemble+export ok" in out
    assert "crps=" in out
    assert (tmp_path / "rollout_artifact" / "meta.json").exists()
    # 06 --artifact: serve the AOT artifact with no model objects
    out = _run("06_serve.py", "--workdir", wd, "--selftest", "--artifact")
    assert "selftest ok" in out
