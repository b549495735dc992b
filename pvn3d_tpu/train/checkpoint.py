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
    """Latest-N + best-1 retention, the reference's checkpoint layout
    (pvn3d.pth.tar rolling latest + pvn3d_best.pth.tar copy on val-loss
    improvement, train_ycb_pvn3d.py:121-129,384-392).

    The main manager prunes purely by recency (bounded disk, latest step
    always restorable); the best checkpoint lives in a ``best/``
    subdirectory written only when ``val_loss`` improves.  orbax's own
    ``best_fn`` retention is deliberately not used: it preserves every
    metric-less save (all of them when no validation is wired), growing
    without bound, and can prune the latest step away from under resume.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 keep_best: bool = True):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        self.best_mgr = None
        self._best = np.inf
        if keep_best:
            best_dir = os.path.join(directory, "best")
            self.best_mgr = ocp.CheckpointManager(
                best_dir,
                options=ocp.CheckpointManagerOptions(max_to_keep=1))
            # Carry the best-so-far across resumes (sidecar json — orbax
            # only persists metrics when its own best_fn is configured).
            self._best_file = os.path.join(best_dir, "best_val_loss.json")
            if os.path.exists(self._best_file):
                import json
                with open(self._best_file) as f:
                    self._best = float(json.load(f)["val_loss"])

    def save(self, step: int, state: Any,
             val_loss: Optional[float] = None) -> None:
        metrics = {"val_loss": float(val_loss)} if val_loss is not None \
            else None
        self.mgr.save(step, args=self._ocp.args.StandardSave(state),
                      metrics=metrics)
        if (self.best_mgr is not None and val_loss is not None
                and float(val_loss) < self._best):
            self._best = float(val_loss)
            self.best_mgr.save(step,
                               args=self._ocp.args.StandardSave(state),
                               metrics=metrics)
            import json
            with open(self._best_file, "w") as f:
                json.dump({"val_loss": self._best, "step": int(step)}, f)

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
        if self.best_mgr is not None:
            self.best_mgr.wait_until_finished()

    def close(self):
        self.mgr.close()
        if self.best_mgr is not None:
            self.best_mgr.close()
