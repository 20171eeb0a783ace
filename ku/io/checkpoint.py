"""Checkpoint / resume via orbax.

Reference mechanisms (SURVEY §5 checkpoint/resume): per-epoch whole-model
h5 saves (ku/backprop/gan.py:982-988), JSON+H5 pairs (ku/utility.py:7-33),
and Keras BackupAndRestore epoch resume (gan.py:392). The reference never
saves optimizer state (``load_model(compile=False)`` → fresh Adam).

TPU-native upgrade: orbax checkpoints of the FULL train state — params +
optimizer state + PRNG key + step — with retention and atomic writes, so
training resumes exactly (optimizer moments included). Weight-only export
for interop stays in :mod:`ku.utility` (JSON+npz).
"""

from __future__ import annotations

import os
from typing import Any, Optional



def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for ku train states."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = 3,
                 save_interval_steps: int = 1):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # Discard incomplete atomic writes BEFORE the manager scans the
        # directory: a process killed mid-save leaves
        # `<step>.orbax-checkpoint-tmp...` dirs, and orbax's item-name
        # inference can read one as a multi-item checkpoint — every
        # later restore then fails with "Must provide `args` of type
        # `Composite`" (hit by the round-5 kill-mid-save resume test on
        # the flagship run). Tmp dirs are garbage by orbax's atomicity
        # contract; the last COMPLETE step is the resume point.
        import shutil

        for entry in os.listdir(self.directory):
            if ".orbax-checkpoint-tmp" in entry:
                shutil.rmtree(os.path.join(self.directory, entry),
                              ignore_errors=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        ocp = _ocp()
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        return bool(saved)

    def restore(self, step: Optional[int] = None, template: Any = None):
        ocp = _ocp()
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_train_state(path: str, state: Any, step: int = 0,
                     max_to_keep: Optional[int] = 10):
    """One-shot full-state save (epoch-save parity with gan.py:982-988,
    but including optimizer state). ``max_to_keep=None`` keeps every step."""
    mgr = CheckpointManager(path, max_to_keep=max_to_keep)
    mgr.save(step, state, force=True)
    mgr.wait_until_finished()
    mgr.close()


def restore_train_state(path: str, template: Any = None, step: Optional[int] = None):
    mgr = CheckpointManager(path)
    out = mgr.restore(step, template=template)
    mgr.close()
    return out
