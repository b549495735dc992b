"""Learning-rate and BN-momentum schedules as pure, traceable functions.

The reference mutates optimizer/module state from Python each iteration
(CyclicLR.step + BNMomentumScheduler.step, train_ycb_pvn3d.py:351-355).
Here both schedules are scalar functions of the step counter evaluated
*inside* the jitted train step, so scheduling costs nothing and checkpoints
need only the step to resume exactly.
"""
from __future__ import annotations

import jax.numpy as jnp

from pvn3d_tpu.config import TrainConfig


def cyclic_lr(step, base_lr: float, max_lr: float, step_size: int,
              mode: str = "triangular", gamma: float = 1.0):
    """Triangular cyclic LR (reference: warmup_scheduler/scheduler.py:255-263).

    lr = base + (max-base) * max(0, 1-|it/ss - 2*cycle + 1|) * scale(cycle)
    """
    it = jnp.asarray(step, jnp.float32)
    ss = jnp.float32(step_size)
    cycle = jnp.floor(1.0 + it / (2.0 * ss))
    x = jnp.abs(it / ss - 2.0 * cycle + 1.0)
    amp = jnp.maximum(0.0, 1.0 - x)
    if mode == "triangular":
        scale = 1.0
    elif mode == "triangular2":
        scale = 1.0 / (2.0 ** (cycle - 1.0))
    elif mode == "exp_range":
        scale = gamma ** it
    else:
        raise ValueError(f"unknown cyclic mode {mode!r}")
    return base_lr + (max_lr - base_lr) * amp * scale


def bn_momentum_at(step, cfg: TrainConfig):
    """BN momentum decay (reference: train_ycb_pvn3d.py:477-484):
    max(0.9 * 0.5 ** floor(it * bs / 2e5), 1e-2) — note the int() floor on
    the exponent in the reference lambda."""
    it = jnp.asarray(step, jnp.float32)
    expo = jnp.floor(it * cfg.mini_batch_size / cfg.bn_decay_step)
    return jnp.maximum(cfg.bn_momentum_init * cfg.bn_decay ** expo,
                       cfg.bn_momentum_clip)


def lr_schedule(cfg: TrainConfig):
    """optax-style schedule closure from the config."""
    def sched(step):
        return cyclic_lr(step, cfg.base_lr, cfg.max_lr, cfg.lr_step_size)
    return sched
