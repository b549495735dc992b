"""Training driver: loop, eval schedule, metric logging, checkpoints.

Functional equivalent of the reference Trainer (train_ycb_pvn3d.py:216-409)
minus its mutable-module plumbing: the jitted step owns all scheduling
(LR/BN-momentum are functions of the step counter), the loop only feeds
batches, logs interval means (CmdLineViz semantics, etw_pytorch_utils/
viz.py:151-184) and checkpoints on the reference's eval cadence.
"""
from __future__ import annotations

import collections
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from pvn3d_tpu.config import Config
from pvn3d_tpu.train.state import TrainState


def eval_frequency(it: int) -> int:
    """Reference is_to_eval cadence (train_ycb_pvn3d.py:319-333)."""
    for bound, freq in ((30000, 5000), (40000, 2000), (50000, 1200),
                        (60000, 800), (80000, 400)):
        if it < bound:
            return freq
    return 200


def is_to_eval(it: int) -> bool:
    return it % eval_frequency(it) == 0


class MeterLogger:
    """Interval-mean metric printer (CmdLineViz semantics).

    ``update`` buffers metric values WITHOUT converting device arrays —
    a per-scalar ``float()`` would synchronize the host on every step
    (each fetch is a ~30-45 ms round trip through the TPU tunnel) and
    serialize dispatch.  One batched ``jax.device_get`` per ``flush``
    pays a single round trip per log interval instead.
    """

    def __init__(self, prefix: str = "train"):
        self.prefix = prefix
        self.buf = collections.defaultdict(list)
        self.t0 = time.time()

    def update(self, metrics: Dict) -> None:
        for k, v in metrics.items():
            self.buf[k].append(v)

    def flush(self, it: int) -> Dict[str, float]:
        vals = jax.device_get(dict(self.buf))
        means = {k: float(np.mean([float(x) for x in v]))
                 for k, v in vals.items() if v}
        if means:
            dt = time.time() - self.t0
            msg = "  ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
            print(f"[{self.prefix} it={it} {dt:.1f}s] {msg}", flush=True)
        self.buf.clear()
        self.t0 = time.time()
        return means


class Trainer:
    def __init__(self, cfg: Config, state: TrainState,
                 train_step: Callable, eval_step: Optional[Callable] = None,
                 checkpoint_manager=None, rng: Optional[jax.Array] = None,
                 log_every: int = 50, put_batch: Callable = None):
        self.cfg = cfg
        self.state = state
        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(eval_step) if eval_step is not None else None
        self.ckpt = checkpoint_manager
        self.rng = rng if rng is not None else jax.random.PRNGKey(
            cfg.train.seed)
        self.log_every = log_every
        self.put_batch = put_batch or (lambda b: b)

    def resume(self) -> int:
        """Restore the latest checkpoint if one exists; returns the step."""
        if self.ckpt is not None:
            restored = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                print(f"resumed from step {int(self.state.step)}",
                      flush=True)
        return int(self.state.step)

    def eval_epoch(self, val_batches: Iterable) -> Dict[str, float]:
        """Mean val losses (reference: Trainer.eval_epoch, :261-290)."""
        logger = MeterLogger("val")
        count = 0
        for batch in val_batches:
            batch = dict(batch)
            # Padded final batch: the duplicate frames weight the interval
            # mean slightly; dropping them entirely would bias it more.
            batch.pop("_n_valid", None)
            _, metrics = self.eval_step(self.state, self.put_batch(batch))
            logger.update({k: v for k, v in metrics.items()})
            count += 1
        means = logger.flush(int(self.state.step))
        means["n_batches"] = count
        return means

    def fit(self, train_batches: Iterable, val_batches_fn=None,
            max_steps: Optional[int] = None,
            prefetch: int = 2) -> None:
        from pvn3d_tpu.data.loader import prefetch_to_device
        logger = MeterLogger("train")
        # Host-side step mirror: the jitted step increments state.step by
        # exactly 1, and int(state.step) every iteration would block on
        # the in-flight computation (one tunnel round trip per step),
        # serializing dispatch against the device.
        it = int(self.state.step)
        for batch in prefetch_to_device(train_batches, self.put_batch,
                                        size=prefetch):
            self.state, metrics = self.train_step(
                self.state, batch, self.rng)
            it += 1
            logger.update(metrics)
            if it % self.log_every == 0:
                logger.flush(it)
            if is_to_eval(it):
                val_loss = None
                if self.eval_step is not None and val_batches_fn is not None:
                    val = self.eval_epoch(val_batches_fn())
                    val_loss = val.get("loss")
                if self.ckpt is not None:
                    self.ckpt.save(it, self.state, val_loss=val_loss)
            if max_steps is not None and it >= max_steps:
                break
        logger.flush(it)
        if self.ckpt is not None:
            self.ckpt.save(it, self.state)
            self.ckpt.wait()
