"""Checkpoint save/restore via orbax (async, sharding-aware).

Reference semantics (train_ycb_pvn3d.py:102-146): periodic checkpoint with
{epoch, it, best_prec, model_state, optimizer_state}, best-copy on val-loss
improvement, auto-resume from the latest file.  Here the whole TrainState
pytree (step/params/batch_stats/opt_state) saves as one sharded orbax
checkpoint; "best" tracking uses orbax's best_fn retention.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 keep_best: bool = True):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m.get("val_loss", np.inf))
            if keep_best else None,
            best_mode="min" if keep_best else None,
        )
        self.mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any,
             val_loss: Optional[float] = None) -> None:
        metrics = {"val_loss": float(val_loss)} if val_loss is not None \
            else None
        self.mgr.save(step, args=self._ocp.args.StandardSave(state),
                      metrics=metrics)

    def restore(self, state_template: Any) -> Optional[Any]:
        """Latest checkpoint restored into the template's structure/sharding,
        or None when the directory is empty (fresh start)."""
        step = self.mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "dtype") else x,
            state_template)
        return self.mgr.restore(
            step, args=self._ocp.args.StandardRestore(abstract))

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()
