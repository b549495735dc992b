"""The jitted train / eval steps.

One functional step = forward + focal/offset losses (weights [2, 1, 1],
reference: train_ycb_pvn3d.py:172-189) + grads + Adam update + BN stat
update.  Under a dp-sharded batch, XLA's GSPMD partitioner inserts the
gradient all-reduce and makes the BN batch statistics global — the
reference's DataParallel scatter/gather and 728-LoC SyncBN machinery
(sync_batchnorm/) have no counterpart here at all.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from pvn3d_tpu.config import Config
from pvn3d_tpu.models.losses import focal_loss, offset_l1_loss, seg_accuracy
from pvn3d_tpu.train.schedule import bn_momentum_at
from pvn3d_tpu.train.state import TrainState


def compute_losses(cfg: Config, outputs: Dict[str, jnp.ndarray],
                   batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Weighted total + components (reference: train_ycb_pvn3d.py:172-189)."""
    labels = batch["labels"]
    seg = focal_loss(outputs["seg_logits"], labels,
                     gamma=cfg.train.focal_gamma)
    kp = offset_l1_loss(outputs["kp_offsets"], batch["kp_targ_ofst"], labels)
    ctr = offset_l1_loss(outputs["ctr_offsets"], batch["ctr_targ_ofst"],
                         labels)
    w = cfg.train.loss_weights
    total = w[0] * seg + w[1] * kp + w[2] * ctr
    return {
        "loss": total, "loss_seg": seg, "loss_kp": kp, "loss_ctr": ctr,
        "acc_rgbd": seg_accuracy(outputs["seg_logits"], labels),
    }


def _remat_policy(name: str):
    """jax.checkpoint policy from its config name (TrainConfig.remat_policy).

    "full" saves nothing.  "dots" saves every MXU-op output (dot_general
    AND conv_general_dilated — the builtin ``dots_saveable`` covers only
    dot_general, which would re-run the whole conv trunk in backward), so
    the rematerialized forward redoes only cheap VPU glue.
    """
    if name == "full":
        return None
    if name == "dots":
        def saveable(prim, *_, **__):
            return prim.name in ("dot_general", "conv_general_dilated")
        return saveable
    raise ValueError(f"unknown remat_policy {name!r} (full|dots)")


def make_train_step(cfg: Config, model, tx: optax.GradientTransformation,
                    ) -> Callable[[TrainState, Dict[str, Any], jax.Array],
                                  tuple[TrainState, Dict[str, jnp.ndarray]]]:
    accum = max(int(cfg.train.grad_accum), 1)

    def train_step(state: TrainState, batch, rng):
        bn_m = bn_momentum_at(state.step, cfg.train)
        drop_rng = jax.random.fold_in(rng, state.step)

        def forward(params, batch_stats, pc, im, ch, bn, dr):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                pc, im, ch, bn, mutable=["batch_stats"],
                rngs={"dropout": dr})

        if cfg.train.remat:
            forward = jax.checkpoint(
                forward, policy=_remat_policy(cfg.train.remat_policy))

        def grads_of(params, stats, mb, dr, seg_scale=1.0):
            # seg_scale: the reference loss is INHOMOGENEOUS in batch size
            # — focal seg is a mean over points while the kp/ctr offset
            # terms are summed over frames (the trainer .sum()s the
            # (bs, n_kpts) matrix, train_ycb_pvn3d.py:176-181).  Summing
            # micro grads therefore reproduces the full-batch gradient
            # exactly iff each micro loss scales only its seg term by
            # 1/n_micro.
            def loss_fn(p):
                outputs, mutated = forward(
                    p, stats, mb["pointcloud"], mb["rgb"], mb["choose"],
                    bn_m, dr)
                metrics = compute_losses(cfg, outputs, mb)
                w = cfg.train.loss_weights
                loss = (seg_scale * w[0] * metrics["loss_seg"]
                        + w[1] * metrics["loss_kp"]
                        + w[2] * metrics["loss_ctr"])
                return loss, (mutated["batch_stats"], metrics)
            (_, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return grads, aux

        if accum == 1:
            grads, (new_stats, metrics) = grads_of(
                state.params, state.batch_stats, batch, drop_rng)
        else:
            # Micro-batch accumulation inside the step (config docstring:
            # TrainConfig.grad_accum).  lax.scan keeps ONE micro graph —
            # activation memory is a single micro-batch's.
            b = batch["pointcloud"].shape[0]
            if b % accum:
                raise ValueError(f"batch {b} not divisible by "
                                 f"grad_accum {accum}")
            micro = {k: v.reshape((accum, b // accum) + v.shape[1:])
                     for k, v in batch.items()}

            def body(carry, mb_i):
                stats, gsum = carry
                mb, i = mb_i
                grads, (stats, metrics) = grads_of(
                    state.params, stats, mb,
                    jax.random.fold_in(drop_rng, i),
                    seg_scale=1.0 / accum)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                return (stats, gsum), metrics

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_stats, grads), micro_m = jax.lax.scan(
                body, (state.batch_stats, g0),
                (micro, jnp.arange(accum)))
            # Recombine metrics with full-batch semantics: means stay
            # means, the summed offset terms sum, total recomposes.
            w = cfg.train.loss_weights
            metrics = {
                "loss_seg": jnp.mean(micro_m["loss_seg"]),
                "loss_kp": jnp.sum(micro_m["loss_kp"]),
                "loss_ctr": jnp.sum(micro_m["loss_ctr"]),
                "acc_rgbd": jnp.mean(micro_m["acc_rgbd"]),
            }
            metrics["loss"] = (w[0] * metrics["loss_seg"]
                               + w[1] * metrics["loss_kp"]
                               + w[2] * metrics["loss_ctr"])

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state)
        metrics = dict(metrics, bn_momentum=bn_m)
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, model):
    """Forward + losses with running BN stats, no dropout, no update
    (reference: Trainer.eval_epoch, train_ycb_pvn3d.py:261-290)."""
    eval_model = model.clone(train=False)

    def eval_step(state: TrainState, batch):
        outputs = eval_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["pointcloud"], batch["rgb"], batch["choose"])
        metrics = compute_losses(cfg, outputs, batch)
        return outputs, metrics

    return eval_step
