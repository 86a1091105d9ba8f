"""Orbax-backed checkpointing.

The reference saves a *positional list* of state dicts to
``best_checkpoint.pth`` + per-epoch files and does not persist the
epoch counter or RNG (``trainer/complex_ddpm_trainer.py:612-631``).
Here the full train state is one named pytree — params, batch stats,
both optimizer states, epoch, step, RNG key, plateau state — saved
per-epoch with auto-resume from latest, plus a ``best`` alias.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointStore:
    def __init__(self, directory: str, max_to_keep: Optional[int] = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "epochs"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best = ocp.StandardCheckpointer()

    def save_epoch(self, epoch: int, state: Any) -> None:
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def save_best(self, state: Any) -> None:
        path = os.path.join(self.directory, "best")
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._best.save(path, state)
        self._best.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> Optional[Any]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        logging.info("restoring checkpoint epoch %d from %s", step, self.directory)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_best(self, template: Any) -> Optional[Any]:
        path = os.path.join(self.directory, "best")
        if not os.path.exists(path):
            return None
        return self._best.restore(path, target=template)

    def close(self):
        self._mgr.close()
