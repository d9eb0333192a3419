"""Scaling-efficiency harness: gridpoints/s across mesh configurations.

The BASELINE metric (BASELINE.json, SURVEY.md §6): throughput at 1 chip /
1 host / N hosts with the weak-scaling target >= 90%.  This harness measures
any (data, spatial) mesh configuration with either the GSPMD DP step or the
shard_map spatial step and reports per-chip efficiency against a 1-device
run.  On this environment's single real chip it degenerates to the 1-chip
row (multi-chip rows run on the virtual CPU mesh for wiring validation);
the same code produces the real numbers on a pod slice.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models.config import TrainConfig
from dlwp_cs_tpu.ops.losses import mse
from dlwp_cs_tpu.parallel.mesh import create_mesh
from dlwp_cs_tpu.parallel.sharding import (
    make_dp_train_step,
    make_spatial_train_step,
    shard_batch,
)
from dlwp_cs_tpu.train.train_step import init_state, make_optimizer, make_train_step

__all__ = ["ScalingResult", "measure_scaling"]


@dataclass
class ScalingResult:
    mesh_shape: tuple[int, int]  # (data, spatial)
    n_devices: int
    step_seconds: float
    gridpoints_per_s: float
    gridpoints_per_s_per_chip: float
    efficiency_vs_single: float | None


def _throughput(step_fn, state, x, y, *, iters: int, gridpoints: int):
    for _ in range(2):
        state, _ = step_fn(state, x, y)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step_fn(state, x, y)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    return dt, gridpoints / dt


def measure_scaling(
    model,
    *,
    n_grid: int,
    in_channels: int,
    out_channels: int,
    batch_per_device: int = 8,
    mesh_configs=((1, 1), (2, 1), (4, 1), (8, 1), (2, 4)),
    iters: int = 10,
    seed: int = 0,
) -> list[ScalingResult]:
    """Weak-scaling sweep: global batch = batch_per_device * data_axis.

    ``mesh_configs``: (data, spatial) tuples; configs needing more devices
    than available are skipped.  spatial > 1 uses the shard_map halo path.
    """
    n_avail = len(jax.devices())
    rng = np.random.default_rng(seed)
    opt = make_optimizer(TrainConfig(learning_rate=1e-3))
    x0 = jnp.asarray(
        rng.normal(size=(1, 6, n_grid, n_grid, in_channels)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(seed), x0)
    results: list[ScalingResult] = []
    base = None
    for data, spatial in mesh_configs:
        n_dev = data * spatial
        if n_dev > n_avail:
            continue
        b = batch_per_device * data
        x = jnp.asarray(
            rng.normal(size=(b, 6, n_grid, n_grid, in_channels)).astype(np.float32)
        )
        y = jnp.asarray(
            rng.normal(size=(b, 6, n_grid, n_grid, out_channels)).astype(np.float32)
        )
        fresh = jax.tree.map(jnp.copy, params)
        if n_dev == 1:
            step = make_train_step(model.apply, opt, mse)
            state = init_state(fresh, opt)
        else:
            mesh = create_mesh(data=data, spatial=spatial)
            if spatial == 1:
                step = make_dp_train_step(model.apply, opt, mse, mesh)
                x, y = shard_batch((x, y), mesh)
            else:
                step = make_spatial_train_step(model.apply, opt, mse, mesh)
                # pre-shard like the DP rows: otherwise every timed
                # iteration includes the input reshard to
                # P('data', None, 'spatial'), inflating exactly the
                # spatial tiers this harness exists to evaluate
                x, y = shard_batch((x, y), mesh, spatial=True)
            state = init_state(fresh, opt)
        gridpoints = b * 6 * n_grid * n_grid
        dt, gps = _throughput(step, state, x, y, iters=iters, gridpoints=gridpoints)
        per_chip = gps / n_dev
        results.append(
            ScalingResult(
                mesh_shape=(data, spatial),
                n_devices=n_dev,
                step_seconds=dt,
                gridpoints_per_s=gps,
                gridpoints_per_s_per_chip=per_chip,
                efficiency_vs_single=None,
            )
        )
    # efficiency_vs_single means what it says: computed only when a
    # 1-device row was measured (previously the FIRST measured config
    # became the silent baseline, so omitting the (1,1) row made a 4-chip
    # run the "single" denominator); the baseline row reports 1.0
    single = next((r for r in results if r.n_devices == 1), None)
    if single is not None:
        base = single.gridpoints_per_s_per_chip
        results = [
            dataclasses.replace(
                r, efficiency_vs_single=r.gridpoints_per_s_per_chip / base
            )
            for r in results
        ]
    return results
