"""End-to-end learning: overfit the tiny model on one synthetic batch.

Validates the full loop (data contract -> forward -> losses -> grads ->
Adam -> BN stats) actually learns: segmentation accuracy rises to
near-perfect and the offset losses collapse when memorizing a single batch.
"""
import dataclasses

import jax
import numpy as np

from pvn3d_tpu.config import TrainConfig
from pvn3d_tpu.data.synthetic import synthetic_batch
from pvn3d_tpu.train.state import create_train_state
from pvn3d_tpu.train.step import make_train_step

import __graft_entry__ as graft


def test_overfit_single_batch():
    cfg = graft._tiny_config()
    # Constant healthy LR for the smoke run (the real cyclic schedule ramps
    # far too slowly to learn anything in 80 steps).
    cfg = dataclasses.replace(
        cfg, train=TrainConfig(base_lr=1e-3, max_lr=1e-3))
    batch = synthetic_batch(cfg, batch_size=2,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64, seed=3)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    first = None
    for _ in range(80):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}

    assert last["loss"] < 0.35 * first["loss"], (first, last)
    assert last["acc_rgbd"] > 0.85, last
    assert last["loss_kp"] < 0.5 * first["loss_kp"], (first, last)
    assert last["loss_ctr"] < 0.5 * first["loss_ctr"], (first, last)
    assert np.isfinite(last["loss"])
