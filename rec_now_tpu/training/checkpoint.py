"""Sharded checkpoint save/restore via Orbax.

New scope relative to the reference (no checkpointing — the PS owned all
state, SURVEY.md §5).  Saves the full :class:`TrainState` — dense
params, optimizer state and the (sharded) embedding table — preserving
shardings, so a v5e-16 job restores shard-local without gathering the
table through one host.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin Orbax wrapper with step-numbered directories."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        """Save a pytree state at ``step`` (async; waits on next save)."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None,
                target: Optional[Any] = None) -> Any:
        """Restore the given (or latest) step.

        Args:
            step: checkpoint step; None = latest.
            target: optional abstract pytree (e.g. built via
                ``jax.eval_shape`` + shardings) controlling placement.
        """
        if step is None:
            step = self._mgr.latest_step()
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        """Block until pending async saves complete."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
