"""Orbax checkpointing with best-k retention.

Replaces Lightning's ModelCheckpoint (monitor val/loss, save_top_k,
save_last — reference configs/callbacks/default.yaml:7-24) and the
step-frequency NStepModelCheckpoint (src/utils/__init__.py:25) with an
orbax CheckpointManager storing (params, opt_state, step, grad-norm ring).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from gcpnet_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 30,
        monitor: str = "val/loss",
        mode: str = "min",
        save_last: bool = True,
        every_n_steps: Optional[int] = None,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.every_n_steps = every_n_steps
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m.get(monitor, float("inf"))),
            best_mode=mode,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._last_dir = os.path.join(self.directory, "last")
        self._last = ocp.StandardCheckpointer() if save_last else None

    def save(self, step: int, state: TrainState, metrics: dict):
        clean = {
            k: float(v)
            for k, v in metrics.items()
            if isinstance(v, (int, float, np.floating)) and np.isfinite(v)
        }
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=clean)
        if self._last is not None:
            path = os.path.join(self._last_dir, "state")
            self._last.save(path, state, force=True)
        self._mgr.wait_until_finished()

    def restore(self, state_template: TrainState, step: Optional[int] = None):
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_best(self, state_template: TrainState):
        step = self._mgr.best_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_last(self, state_template: TrainState):
        path = os.path.join(self._last_dir, "state")
        if not os.path.exists(path):
            return self.restore(state_template)
        return ocp.StandardCheckpointer().restore(path, target=state_template)

    @property
    def best_step(self):
        return self._mgr.best_step()

    def close(self):
        self._mgr.close()
