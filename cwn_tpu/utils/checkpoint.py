"""Orbax-based checkpoint/resume for training state.

The reference trains end-to-end in one process with no persistence
(/root/reference SURVEY section 5.4); here full train state (params, batch
stats, optimizer state, scheduler/python state, epoch counter) is saved
atomically with retention, and training resumes exactly.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for Trainer state."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, trainer, extra: Optional[Dict[str, Any]] = None):
        """Persist trainer state at `step` (epoch)."""
        sched = trainer.scheduler
        sched_state = {k: v for k, v in vars(sched).items()
                       if isinstance(v, (int, float, bool, str, type(None)))}
        arrays = {
            "params": jax.device_get(trainer.params),
            "batch_stats": jax.device_get(trainer.batch_stats),
            "opt_state": jax.device_get(trainer.opt_state),
            "rng": jax.device_get(trainer.rng),
        }
        meta = {"scheduler": sched_state, "extra": extra or {}}
        self._mgr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(arrays),
            meta=ocp.args.JsonSave(meta)))
        self._mgr.wait_until_finished()

    def restore(self, trainer, step: Optional[int] = None) -> Optional[int]:
        """Restore the latest (or given) step into trainer; returns the step
        or None if no checkpoint exists."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "params": jax.device_get(trainer.params),
            "batch_stats": jax.device_get(trainer.batch_stats),
            "opt_state": jax.device_get(trainer.opt_state),
            "rng": jax.device_get(trainer.rng),
        }
        restored = self._mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(template),
            meta=ocp.args.JsonRestore()))
        state = restored["state"]
        trainer.params = state["params"]
        trainer.batch_stats = state["batch_stats"]
        trainer.opt_state = state["opt_state"]
        trainer.rng = jax.numpy.asarray(state["rng"])
        for k, v in (restored["meta"] or {}).get("scheduler", {}).items():
            setattr(trainer.scheduler, k, v)
        return int(step)

    def restore_meta(self, step: Optional[int] = None) -> Dict[str, Any]:
        """The `extra` metadata saved at `step` (default: latest)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return {}
        restored = self._mgr.restore(step, args=ocp.args.Composite(
            meta=ocp.args.JsonRestore()))
        return (restored["meta"] or {}).get("extra", {})

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
