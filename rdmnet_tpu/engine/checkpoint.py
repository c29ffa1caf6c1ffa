"""Orbax checkpointing: snapshot save/load with epoch metadata.

Replaces the reference's torch snapshot logic (reference:
geotransformer/engine/base_trainer.py:113-179): per-epoch snapshots plus a
rolling latest snapshot with optimizer state, resume support.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metadata: Optional[dict] = None):
        # always write the metadata item: restore() unconditionally requests
        # it, so omitting it for metadata=None would make such snapshots
        # unrestorable (orbax errors on missing Composite items)
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            metadata=ocp.args.JsonSave(metadata or {}),
        )
        # async: the write overlaps the next epoch's compute; readers
        # (latest_step/restore/close) synchronize before touching disk state
        self._mgr.save(step, args=args)

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def read_metadata(self, step: Optional[int] = None) -> dict:
        """Read only the JSON metadata of a snapshot (no state restore)."""
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(metadata=ocp.args.JsonRestore())
        )
        return restored.get("metadata") or {}

    def restore(self, state_template: Any, step: Optional[int] = None) -> Tuple[Any, dict]:
        self._mgr.wait_until_finished()
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], (restored.get("metadata") or {})

    def restore_params(self, step: Optional[int] = None) -> Any:
        """Restore ONLY the model params subtree, template-free.

        For warm starts (curriculum phases, fine-tuning) the optimizer tree
        of the saved state need not match the new run's (e.g. a MultiSteps
        wrapper added by --grad_acc), so a full-state template restore would
        fail; this reads the raw saved pytree and returns its 'params'."""
        self._mgr.wait_until_finished()
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
        )
        return restored["state"]["params"]

    def close(self):
        self._mgr.close()
