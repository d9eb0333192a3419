"""Orbax checkpointing: the reference's save/load, done right.

Capability parity with ``DLWP/util.py::save_model / load_model`` and the
``SaveWeightsOnEpoch`` callback (SURVEY.md §2 rows 5, 16; §3.4).  The
reference pickles its wrapper object and stores Keras h5 weights, requiring a
``custom_objects`` registry at load time — fragile across versions.  Here the
model is a pure pytree, so a checkpoint is just
``{state: TrainState pytree, config: json, extras: json-able dict}`` written
with orbax (async-capable, reshardable on restore across host counts).
"""

from __future__ import annotations

import json
import warnings
from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp

__all__ = [
    "save_checkpoint",
    "wait_for_checkpoints",
    "restore_checkpoint",
    "restore_aux",
    "latest_step",
    "save_json",
    "load_json",
]


def _root(path) -> Path:
    return Path(path).absolute()


_ASYNC_CKPTR: ocp.AsyncCheckpointer | None = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(
    path,
    state,
    *,
    step: int,
    extras: dict | None = None,
    background: bool = False,
    aux: dict[str, Any] | None = None,
) -> Path:
    """Write ``state`` (any pytree) under ``path/step_{step}``; returns dir.

    ``background=True`` uses orbax async checkpointing (SURVEY.md §5.4):
    device buffers are snapshotted and the write proceeds off the critical
    path; call :func:`wait_for_checkpoints` (or save again) before relying
    on the files.

    ``aux``: optional named side pytrees written under ``step_{step}/<name>``
    (e.g. the early stopper's best-params snapshot); ``None`` values are
    skipped.  Restore them with :func:`restore_aux`.
    """
    root = _root(path)
    root.mkdir(parents=True, exist_ok=True)
    target = root / f"step_{step}"
    if background:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # at most one outstanding save
        ckptr.save(target / "state", args=ocp.args.StandardSave(state), force=True)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target / "state", state, force=True)
    if aux:
        with ocp.StandardCheckpointer() as ckptr:
            for name, tree in aux.items():
                if name in ("state", "extras.json"):
                    raise ValueError(f"reserved aux name {name!r}")
                if tree is not None:
                    ckptr.save(target / name, tree, force=True)
    if extras is not None:
        save_json(target / "extras.json", extras)
    return target


def wait_for_checkpoints() -> None:
    """Block until any background checkpoint writes are durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def restore_checkpoint(path, target_state, *, step: int | None = None):
    """Restore the pytree saved by :func:`save_checkpoint`.

    ``target_state``: a pytree of the same structure (e.g. a freshly-inited
    TrainState) used as the abstract template, so restoration reshards onto
    whatever device mesh the template's arrays live on.
    Returns ``(state, extras_dict_or_None)``.
    """
    root = _root(path)
    if step is None:
        # Auto-selected: walk complete steps newest-first, falling back past
        # any checkpoint a crash left unreadable (a step_N dir can exist with
        # extras.json while the async state write was still in flight).
        candidates = sorted(_complete_steps(root), reverse=True)
        if not candidates:
            raise FileNotFoundError(f"no checkpoints under {root}")
        last_err = None
        for s in candidates:
            try:
                out = _restore_step(root / f"step_{s}", target_state)
            except Exception as e:  # corrupt/partial — try the previous one
                # surface the skip loudly: silently resuming from an OLDER
                # step (and overwriting newer progress) must be visible
                warnings.warn(
                    f"checkpoint step_{s} under {root} failed to restore "
                    f"({type(e).__name__}: {e}); falling back to the "
                    "previous step",
                    RuntimeWarning,
                    stacklevel=2,
                )
                last_err = e
            else:
                return out
        raise RuntimeError(
            f"all checkpoints under {root} failed to restore"
        ) from last_err
    return _restore_step(root / f"step_{step}", target_state)


def restore_aux(path, step: int, name: str, template):
    """Restore an ``aux`` pytree saved next to ``step``'s state, or ``None``
    if that checkpoint carries no such tree."""
    target = _root(path) / f"step_{step}" / name
    if not target.exists():
        return None
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(target, template)


def _restore_step(target: Path, target_state):
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(target / "state", target_state)
    extras_path = target / "extras.json"
    extras = load_json(extras_path) if extras_path.exists() else None
    return state, extras


def _complete_steps(root: Path) -> list[int]:
    """Steps whose orbax state write has been finalized.

    Orbax commits atomically (tmp dir renamed to ``state``), so the presence
    of ``step_N/state`` is the durability marker; a crash mid-async-save
    leaves only the tmp dir (plus possibly extras.json) and must not be
    selected as "latest".
    """
    if not root.exists():
        return []
    steps = []
    for p in root.iterdir():
        if p.is_dir() and p.name.startswith("step_") and (p / "state").exists():
            try:
                steps.append(int(p.name.split("_", 1)[1]))
            except ValueError:
                continue
    return steps


def latest_step(path) -> int | None:
    steps = _complete_steps(_root(path))
    return max(steps) if steps else None


def save_json(path, obj: Any) -> None:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(obj, indent=2))


def load_json(path) -> Any:
    return json.loads(Path(path).read_text())
