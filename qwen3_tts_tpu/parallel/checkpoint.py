"""Training checkpoint / resume for the joint TTS train state.

The reference's checkpoint subsystem is LOAD-ONLY (SURVEY.md §5: a single
`model.safetensors` read at pipeline init — AudioDecoder.swift:196-305,
Qwen3Talker.swift:114-270 — with no saving and no resume). This module adds
the save/resume half that a production TPU training loop needs:

- orbax-backed atomic step directories with bounded retention,
- sharding-aware restore: the caller passes the LIVE train state (or any
  same-structure template) and every restored leaf lands directly on that
  leaf's `NamedSharding` — a resumed (dp, tp) job keeps its placement with
  no post-restore re-shard traffic,
- synchronous writes by default so "save returned" means "bytes are on
  disk" (async checkpointing buys nothing at this model scale and makes
  crash semantics murkier).

The train state is whatever pytree the caller composes; the canonical shape
used by `scripts`/tests is ``{"params": both, "opt_state": opt_state}``
with `both = {"talker": ..., "cp": ...}` as produced by
`parallel.train.make_tts_train_step`.
"""

from __future__ import annotations

import os
from typing import Any

import jax

__all__ = [
    "save_train_state",
    "restore_train_state",
    "latest_step",
    "all_steps",
]


def _manager(directory: str, keep: int | None = None, create: bool = False):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep,
        enable_async_checkpointing=False,
        # read paths must never create the directory: a typo'd restore path
        # would otherwise leave an empty orbax root behind as a side effect
        create=create,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def _abstract_like(tree: Any) -> Any:
    """Shape/dtype/sharding skeleton of a train-state pytree: restore targets
    built from this land each leaf on the template leaf's sharding."""

    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if hasattr(x, "shape") and hasattr(x, "dtype"):  # numpy leaves
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        return x

    return jax.tree.map(leaf, tree)


def save_train_state(
    directory: str, step: int, state: Any, *, keep: int | None = 3
) -> None:
    """Write `state` (any pytree of arrays) as checkpoint `step` under
    `directory`, keeping at most `keep` most-recent steps (None = keep all).
    Synchronous and atomic: on return the step directory is complete."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory, keep=keep, create=True)
    try:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    finally:
        mgr.close()


def latest_step(directory: str) -> int | None:
    """Most recent checkpoint step under `directory`, or None if empty."""
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    try:
        return mgr.latest_step()
    finally:
        mgr.close()


def all_steps(directory: str) -> list[int]:
    """All retained checkpoint steps, ascending."""
    if not os.path.isdir(directory):
        return []
    mgr = _manager(directory)
    try:
        return sorted(mgr.all_steps())
    finally:
        mgr.close()


def restore_train_state(
    directory: str, template: Any, step: int | None = None
) -> tuple[int, Any]:
    """Restore (step, state) from `directory`.

    `template` is a same-structure pytree (typically the freshly initialized
    live train state): every restored leaf takes the template leaf's shape,
    dtype, and — for sharded jax.Arrays — its NamedSharding, so restoring
    under a mesh reproduces the exact pre-save placement. `step` selects a
    specific checkpoint (default: latest). Raises FileNotFoundError if the
    directory holds no checkpoint.
    """
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        raise FileNotFoundError(f"no checkpoint directory at {directory}")
    mgr = _manager(directory)
    try:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {directory}")
        target = _abstract_like(template)
        state = mgr.restore(step, args=ocp.args.StandardRestore(target))
        return int(step), state
    finally:
        mgr.close()
