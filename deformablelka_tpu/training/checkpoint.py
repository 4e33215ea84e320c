"""Checkpoint / resume (orbax-backed).

Parity target: network_trainer_synapse.py:283-348 — `model_best`,
`model_latest`, `model_final_checkpoint` with {epoch, state_dict,
optimizer, plot/best bookkeeping}; restore via `--continue_training`
(run_training.py:184-190). The scheduled-save policy mirrors
`maybe_save_checkpoint` (network_trainer_synapse.py:546-556): every
`save_every` epochs once past epoch 400, an additional immutable
`model_ep_%03d` checkpoint is written (unless `save_latest_only`),
plus `model_latest`. Here the same roles map to orbax checkpoints
holding the full TrainState + a trainer bookkeeping dict.

TPU-native extras over the reference:
- **Async saves**: the device→host fetch is synchronous (so training
  can mutate `state` immediately) but serialization happens on a
  background thread, overlapping disk IO with the next training
  epochs. `wait_until_finished()` joins; load/overwrite/exists
  implicitly join first so readers always see complete checkpoints.
- **GC keep-policy**: at most `max_scheduled_keep` `model_ep_*`
  checkpoints are retained (oldest deleted), bounding disk for
  1000-epoch runs. Named role checkpoints (best/latest/final) are
  never GC'd.
"""

from __future__ import annotations

import atexit
import json
import re
import shutil
import threading
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_EP_RE = re.compile(r"^model_ep_(\d+)$")


class CheckpointManager:
    def __init__(self, directory: str | Path, *, async_save: bool = True,
                 max_scheduled_keep: int = 5):
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.async_save = async_save
        self.max_scheduled_keep = max_scheduled_keep
        self._pending: Optional[threading.Thread] = None
        self._pending_err: Optional[BaseException] = None
        # Join any in-flight save before the interpreter tears down the
        # thread machinery — otherwise a final async save races process
        # exit (daemon thread killed mid-orbax-commit leaves a corrupt
        # checkpoint and "cannot schedule new futures after interpreter
        # shutdown" noise).
        atexit.register(self._drain_at_exit)

    def _drain_at_exit(self):
        try:
            self.wait_until_finished()
        except BaseException:
            pass  # exit path: nothing can handle it anymore

    def _path(self, name: str) -> Path:
        return self.dir / name

    # -- async plumbing --------------------------------------------------
    def wait_until_finished(self):
        """Join any in-flight async save; re-raise its error if it died."""
        t, self._pending = self._pending, None
        if t is not None:
            t.join()
        self._ckpt.wait_until_finished()
        err, self._pending_err = self._pending_err, None
        if err is not None:
            raise err

    def _write(self, name: str, state, bookkeeping: Optional[dict]):
        path = self._path(name)
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path, state)
        self._ckpt.wait_until_finished()
        if bookkeeping is not None:
            (self.dir / f"{name}.json").write_text(
                json.dumps(bookkeeping, default=float))

    def save(self, name: str, state, bookkeeping: Optional[dict] = None):
        # Fetch to host synchronously: the caller may update `state`
        # in-place on device right after; the disk write is async.
        self.wait_until_finished()
        host_state = jax.device_get(state)
        if not self.async_save:
            self._write(name, host_state, bookkeeping)
            return

        def worker():
            try:
                self._write(name, host_state, bookkeeping)
            except BaseException as e:  # surfaced at next join
                self._pending_err = e

        t = threading.Thread(target=worker, daemon=True,
                             name=f"ckpt-save-{name}")
        t.start()
        self._pending = t

    def load(self, name: str, target):
        self.wait_until_finished()
        state = self._ckpt.restore(self._path(name), target)
        meta = None
        metaf = self.dir / f"{name}.json"
        if metaf.exists():
            meta = json.loads(metaf.read_text())
        return state, meta

    def exists(self, name: str) -> bool:
        self.wait_until_finished()
        return self._path(name).exists()

    # -- scheduled checkpoints + GC ---------------------------------------
    def scheduled_epochs(self) -> list:
        """Epoch numbers of retained `model_ep_*` checkpoints (sorted)."""
        out = []
        for p in self.dir.iterdir():
            m = _EP_RE.match(p.name)
            if m and p.is_dir():
                out.append(int(m.group(1)))
        return sorted(out)

    def save_scheduled(self, epoch: int, state,
                       bookkeeping: Optional[dict] = None):
        """Save an immutable `model_ep_%03d` and GC beyond the keep cap."""
        self.save(f"model_ep_{epoch:03d}", state, bookkeeping)
        self.wait_until_finished()
        eps = self.scheduled_epochs()
        while self.max_scheduled_keep and len(eps) > self.max_scheduled_keep:
            old = eps.pop(0)
            name = f"model_ep_{old:03d}"
            shutil.rmtree(self._path(name), ignore_errors=True)
            metaf = self.dir / f"{name}.json"
            if metaf.exists():
                metaf.unlink()


def should_save_scheduled(epoch: int, save_every: int,
                          warmup_epochs: int = 400) -> bool:
    """Reference cadence (network_trainer_synapse.py:551): every
    `save_every` epochs once past `warmup_epochs`. `epoch` here is the
    post-increment epoch counter (the reference tests pre-increment
    `epoch % save_every == save_every - 1`, equivalent)."""
    return epoch > warmup_epochs + 1 and epoch % save_every == 0
