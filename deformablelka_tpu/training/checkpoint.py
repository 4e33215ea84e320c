"""Checkpoint / resume (orbax-backed).

Parity target: network_trainer_synapse.py:283-348 — `model_best`,
`model_latest`, `model_final_checkpoint` with {epoch, state_dict,
optimizer, plot/best bookkeeping}; restore via `--continue_training`
(run_training.py:184-190). Here the same roles map to orbax checkpoints
holding the full TrainState + trainer bookkeeping dict.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> Path:
        return self.dir / name

    def save(self, name: str, state, bookkeeping: Optional[dict] = None):
        path = self._path(name)
        if path.exists():
            import shutil
            shutil.rmtree(path)
        self._ckpt.save(path, state)
        self._ckpt.wait_until_finished()
        if bookkeeping is not None:
            (self.dir / f"{name}.json").write_text(
                json.dumps(bookkeeping, default=float))

    def load(self, name: str, target):
        state = self._ckpt.restore(self._path(name), target)
        meta = None
        metaf = self.dir / f"{name}.json"
        if metaf.exists():
            meta = json.loads(metaf.read_text())
        return state, meta

    def exists(self, name: str) -> bool:
        return self._path(name).exists()
