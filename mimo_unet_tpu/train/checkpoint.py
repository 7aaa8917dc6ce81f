"""Checkpoint/resume with the checkpoint-carries-hparams contract.

The reference relies on Lightning's ``save_hyperparameters`` so that
``load_from_checkpoint(path)`` rebuilds the model with zero config
(reference: mimo/models/mimo_unet.py:83-87, ensemble.py:42).  Here a
checkpoint directory holds an Orbax pytree (params, model_state, opt_state,
loss buffer, step) plus ``hparams.json``, and ``load_checkpoint`` /
``rebuild_task`` restore both the state and the task object — the same
zero-config contract, which the ensemble/eval tooling depends on.

Also supported: loading PyTorch reference ``.ckpt`` files directly via
``mimo_unet_tpu.interop`` (so users can migrate trained models).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

HPARAMS_FILE = "hparams.json"
STATE_DIR = "state"

# One AsyncCheckpointer per process: orbax's async signaling layer keys
# barriers by a global operation counter, and two live AsyncCheckpointer
# instances in one process race those keys (observed: TimeoutError
# 'awaitable_signals_contract_N/step_directory_creation' when a second
# manager saved while the first instance was still alive).  All
# CheckpointManagers share this singleton; it serializes overlapping
# saves internally.
_ASYNC_CKPTR = None


def _shared_async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def _task_from_hparams(hparams: Dict[str, Any]):
    from mimo_unet_tpu.tasks.evidential import EvidentialUnetTask
    from mimo_unet_tpu.tasks.mimo import MimoUnetTask

    kind = hparams.get("task", "mimo_unet")
    cls = {"mimo_unet": MimoUnetTask, "evidential_unet": EvidentialUnetTask}[kind]
    field_names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in hparams.items() if k in field_names})


def save_checkpoint(path: str, state, hparams: Dict[str, Any],
                    checkpointer=None) -> Optional[str]:
    """Write an Orbax checkpoint + hparams.json under ``path``.

    With ``checkpointer`` (an ``ocp.AsyncCheckpointer``), the save is
    dispatched asynchronously: device buffers are copied to host before
    this returns (so training may donate/overwrite the state), and the
    file write overlaps subsequent train steps — the TPU-native
    equivalent of the reference's non-blocking ModelCheckpoint callback
    (train_nyuv2_depth.py:22-36).  The caller owns
    ``checkpointer.wait_until_finished()``.

    hparams.json commits AFTER the state does, never before: a crash
    mid-async-write must not leave fresh hparams (with e.g. new "best"
    metadata) next to a stale state dir that a later resume would read as
    consistent.  Sync saves simply write it after the blocking state
    write; async saves stage ``hparams.json.pending`` and return its path
    — the caller promotes it once ``wait_until_finished`` confirms the
    state commit (CheckpointManager does this).  Returns None for sync
    saves."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    state_path = os.path.join(path, STATE_DIR)
    hp_final = os.path.join(path, HPARAMS_FILE)
    if checkpointer is None:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(state_path, state, force=True)
        ckptr.wait_until_finished()
        with open(hp_final, "w") as f:
            json.dump(hparams, f, indent=2, default=str)
        return None
    pending = hp_final + ".pending"
    with open(pending, "w") as f:
        json.dump(hparams, f, indent=2, default=str)
    checkpointer.save(state_path, args=ocp.args.StandardSave(state),
                      force=True)
    return pending


def _promote_pending_hparams(pending: str) -> None:
    """Atomically publish a staged hparams file (state commit confirmed)."""
    if os.path.exists(pending):
        os.replace(pending, pending[: -len(".pending")])


def _read_hparams_file(path: str) -> Dict[str, Any]:
    """Read hparams.json, falling back to a staged .pending file when the
    final one is absent (a crash after the state committed but before the
    pending promote — the state is durable, so the pending hparams
    describe it)."""
    final = os.path.join(path, HPARAMS_FILE)
    if not os.path.exists(final) and os.path.exists(final + ".pending"):
        final = final + ".pending"
    with open(final) as f:
        return json.load(f)


def load_hparams(path: str) -> Dict[str, Any]:
    return _read_hparams_file(os.path.abspath(path))


def load_checkpoint(path: str, steps_per_epoch: int = 1):
    """Restore (task, TrainState) from a checkpoint directory.

    ``steps_per_epoch`` is only needed to rebuild the optimizer pytree
    structure; the restored opt_state overwrites its values.

    If ``path`` points at a PyTorch Lightning ``.ckpt`` file from the
    reference implementation, it is converted on the fly (optimizer state
    starts fresh in that case).
    """
    if path.endswith(".ckpt") and os.path.isfile(path):
        return _load_reference_ckpt(path, steps_per_epoch)

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    hparams = load_hparams(path)
    task = _task_from_hparams(hparams)
    abstract = task.init_state(steps_per_epoch)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(
        os.path.join(path, STATE_DIR),
        jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract),
    )
    return task, state


def _load_reference_ckpt(path: str, steps_per_epoch: int):
    """Convert a reference Lightning checkpoint into (task, TrainState)."""
    import jax.numpy as jnp

    from mimo_unet_tpu.interop import load_reference_checkpoint
    from mimo_unet_tpu.tasks.mimo import TrainState

    cfg, params, model_state, hparams = load_reference_checkpoint(path)
    task_hparams = dict(hparams)
    task_hparams.setdefault("task", "mimo_unet")
    task = _task_from_hparams(task_hparams)
    base = task.init_state(steps_per_epoch)
    return task, TrainState(
        step=base.step,
        params=params,
        model_state=model_state,
        opt_state=base.opt_state,
        loss_buffer=base.loss_buffer,
    )


class CheckpointManager:
    """save_last + best-by-val_loss retention, like the reference's
    ModelCheckpoint callbacks (train_nyuv2_depth.py:22-36)."""

    def __init__(self, root: str, hparams: Dict[str, Any],
                 async_save: bool = True):
        self.root = os.path.abspath(root)
        self.hparams = hparams
        self.best_val_loss = float("inf")
        self._async = async_save
        self._ckptr = None
        self._pending_hparams: list = []
        os.makedirs(self.root, exist_ok=True)

    def _checkpointer(self):
        """The process-shared AsyncCheckpointer: save() copies device
        buffers to host synchronously (no device_put from a background
        thread — see data/core.py prefetch note) and overlaps the file
        write with the next epoch's train steps."""
        if not self._async:
            return None
        if self._ckptr is None:
            self._ckptr = _shared_async_checkpointer()
        return self._ckptr

    def wait_until_finished(self) -> None:
        """Block until every dispatched async save is durably committed
        (call before reading a just-written checkpoint or exiting), then
        publish the staged hparams files (state-commit-first ordering —
        see save_checkpoint)."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()
        for pending in self._pending_hparams:
            _promote_pending_hparams(pending)
        self._pending_hparams = []

    @property
    def last_path(self) -> str:
        return os.path.join(self.root, "last")

    @property
    def best_path(self) -> str:
        return os.path.join(self.root, "best")

    def _save(self, path: str, state, hparams) -> None:
        pending = save_checkpoint(path, state, hparams,
                                  checkpointer=self._checkpointer())
        if pending is not None:
            self._pending_hparams.append(pending)

    def save_last(self, state) -> None:
        self._save(self.last_path, state, self.hparams)

    def maybe_save_best(self, state, val_loss: float, epoch: int, step: int) -> bool:
        if val_loss < self.best_val_loss:
            self.best_val_loss = float(val_loss)
            hp = dict(self.hparams)
            hp["best"] = {"epoch": epoch, "step": step, "val_loss": float(val_loss)}
            self._save(self.best_path, state, hp)
            return True
        return False

    def restore_best_tracking(self) -> float:
        """Reload best_val_loss from best/hparams.json (written by
        maybe_save_best) so resumed runs never regress best/.  Called by the
        trainer on resume only — a fresh fit into a reused directory starts
        tracking from scratch, like a new Lightning ModelCheckpoint."""
        if os.path.isdir(os.path.join(self.best_path, STATE_DIR)):
            try:
                best = _read_hparams_file(self.best_path).get("best", {})
            except FileNotFoundError:
                best = {}
            if "val_loss" in best:
                self.best_val_loss = float(best["val_loss"])
        return self.best_val_loss

    def has_last(self) -> bool:
        return os.path.isdir(os.path.join(self.last_path, STATE_DIR))
