"""Orbax-based checkpointing with resume semantics.

Capability of the reference's checkpoint subsystem (SURVEY.md section 5.4):
periodic atomic saves of model (+ teacher), optimizer state and iteration;
``resume_or_load`` restores the full train state from ``last_checkpoint`` or
loads weights-only from an explicit path.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, *, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, tree, *, wait: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, target, step: int | None = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(jax.tree.map(lambda x: x, target))
        )

    def resume_or_load(self, target, weights_path: str | None = None):
        """Restore full state from the latest checkpoint if present, else
        return ``target`` unchanged (caller loads ``weights_path`` via the
        converter) — reference ``resume_or_load`` semantics
        (``trainer.py:233-257``)."""
        restored = self.restore(target)
        return (restored, True) if restored is not None else (target, False)
