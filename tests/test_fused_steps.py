"""Fused k-step dispatch (TrainConfig.fused_steps): one jitted lax.scan
per k batches must replay the same optimizer-step sequence as per-step
dispatch — same per-step losses, same step records (incl. the ragged tail
that falls back to single steps)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlwp_cs_tpu.models import CubeSphereUNet, DataConfig, TrainConfig, UNetConfig
from dlwp_cs_tpu.train import Trainer


N = 8


def _batches(dcfg, n_batches, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.normal(size=(batch, 6, N, N, dcfg.input_channels)).astype(np.float32),
            rng.normal(size=(batch, 6, N, N, dcfg.output_channels)).astype(np.float32),
        )
        for _ in range(n_batches)
    ]


def _run(dcfg, batches, fused, mesh=None, epochs=2):
    model = CubeSphereUNet(
        UNetConfig(output_channels=dcfg.output_channels, filters=(4, 8))
    )
    tr = Trainer(
        model,
        TrainConfig(
            learning_rate=1e-3,
            max_epochs=epochs,
            checkpoint_every_epochs=100,
            metrics_every=3,
            fused_steps=fused,
        ),
        mesh=mesh,
    )
    state = tr.init(jnp.asarray(batches[0][0]))
    state = tr.fit(state, lambda: iter(batches), verbose=False)
    return state, tr


def test_fused_matches_single_dispatch():
    dcfg = DataConfig(grid_n=N)
    batches = _batches(dcfg, 5)  # 5 batches, fused=2 -> 2 chunks + tail
    s1, t1 = _run(dcfg, batches, fused=1)
    s2, t2 = _run(dcfg, batches, fused=2)
    l1 = [r["loss"] for r in t1.history.steps]
    l2 = [r["loss"] for r in t2.history.steps]
    assert len(l1) == len(l2) == 10
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)
    assert [r["step"] for r in t2.history.steps] == list(range(10))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_fused_dp_mesh():
    from dlwp_cs_tpu.parallel import create_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    dcfg = DataConfig(grid_n=N)
    batches = _batches(dcfg, 4)
    mesh = create_mesh(data=2, spatial=1)
    s1, t1 = _run(dcfg, batches, fused=1, mesh=mesh, epochs=1)
    s2, t2 = _run(dcfg, batches, fused=2, mesh=mesh, epochs=1)
    np.testing.assert_allclose(
        [r["loss"] for r in t1.history.steps],
        [r["loss"] for r in t2.history.steps],
        rtol=1e-5,
        atol=1e-6,
    )


def test_fused_dp_shardmap_matches_gspmd():
    """dp_impl='shard_map' must be honored on the FUSED dispatch path too
    (it previously fell back to the GSPMD scanned step silently) and match
    the GSPMD results."""
    from dlwp_cs_tpu.parallel import create_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    dcfg = DataConfig(grid_n=N)
    batches = _batches(dcfg, 4)
    mesh = create_mesh(data=2, spatial=1)

    def run(dp_impl):
        model = CubeSphereUNet(
            UNetConfig(output_channels=dcfg.output_channels, filters=(4, 8))
        )
        tr = Trainer(
            model,
            TrainConfig(
                learning_rate=1e-3,
                max_epochs=1,
                checkpoint_every_epochs=100,
                metrics_every=3,
                fused_steps=2,
            ),
            mesh=mesh,
            dp_impl=dp_impl,
        )
        state = tr.init(jnp.asarray(batches[0][0]))
        state = tr.fit(state, lambda: iter(batches), verbose=False)
        return state, tr

    s1, t1 = run("gspmd")
    s2, t2 = run("shard_map")
    np.testing.assert_allclose(
        [r["loss"] for r in t1.history.steps],
        [r["loss"] for r in t2.history.steps],
        rtol=1e-5,
        atol=1e-6,
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_fused_tail_with_prefetch_does_not_deadlock():
    """PrefetchIterator must raise StopIteration on EVERY call after
    exhaustion: the fused chunk loop calls next() once more after a partial
    tail chunk, which deadlocked the one-shot-sentinel implementation
    (5 batches, fused_steps=2 -> 2 full chunks + tail of 1)."""
    from dlwp_cs_tpu.data.prefetch import prefetch_to_device

    dcfg = DataConfig(grid_n=N)
    batches = _batches(dcfg, 5)
    model = CubeSphereUNet(
        UNetConfig(output_channels=dcfg.output_channels, filters=(4,))
    )
    tr = Trainer(
        model,
        TrainConfig(
            learning_rate=1e-3, max_epochs=2, checkpoint_every_epochs=100,
            fused_steps=2,
        ),
    )
    state = tr.init(jnp.asarray(batches[0][0]))
    state = tr.fit(
        state, lambda: prefetch_to_device(iter(batches)), verbose=False
    )
    assert int(state.step) == 10
    assert len(tr.history.steps) == 10


def test_prefetch_repeated_stopiteration_and_close():
    from dlwp_cs_tpu.data.prefetch import PrefetchIterator

    it = PrefetchIterator(iter([np.zeros(2), np.ones(2)]))
    assert len(list(it)) == 2
    for _ in range(3):  # exhausted: every subsequent next() raises
        with pytest.raises(StopIteration):
            next(it)
    # abandoning early + close() releases the worker
    it2 = PrefetchIterator(iter([np.zeros(2)] * 16), depth=2)
    next(it2)
    it2.close()
    it2._thread.join(timeout=10)
    assert not it2._thread.is_alive()
