"""Train state: a pure pytree carried through the jitted train step.

Replaces the reference's scattered mutable state (model buffers, optimizer
param_groups, it/epoch counters; train_ycb_pvn3d.py:102-146) with one
functional container.  The optimizer itself (optax GradientTransformation)
is static and closed over by the step functions.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pvn3d_tpu.config import Config
from pvn3d_tpu.models.pvn3d import PVN3D
from pvn3d_tpu.train.schedule import lr_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with the triangular cyclic LR (reference: Adam at
    train_ycb_pvn3d.py:447, CyclicLR at :471-475)."""
    tx = optax.adam(learning_rate=lr_schedule(cfg.train))
    if cfg.train.weight_decay:
        tx = optax.chain(
            optax.add_decayed_weights(cfg.train.weight_decay), tx)
    return tx


def create_train_state(cfg: Config, rng: jax.Array, example_batch,
                       model: Optional[PVN3D] = None,
                       tx: Optional[optax.GradientTransformation] = None,
                       ) -> tuple[TrainState, PVN3D,
                                  optax.GradientTransformation]:
    """Initialize params/batch_stats/opt_state from an example batch."""
    if model is None:
        model = PVN3D(cfg=cfg.model, train=True)
    if tx is None:
        tx = make_optimizer(cfg)
    init_rng, drop_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": drop_rng},
        example_batch["pointcloud"], example_batch["rgb"],
        example_batch["choose"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return state, model, tx


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
