"""Training losses: focal segmentation loss + masked offset L1.

Capability match for the reference's FocalLoss / OFLoss
(pvn3d/lib/loss.py:13-89) as pure jnp functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               gamma: float = 2.0, alpha=None) -> jnp.ndarray:
    """Multi-class focal loss, mean-reduced.

    loss = -(1 - p_t)^gamma * log p_t over all points (reference:
    loss.py:22-42 with size_average=True).  ``logits`` (..., C) raw scores,
    ``labels`` (...) int class ids.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logpt = jnp.take_along_axis(
        logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pt = jnp.exp(jax.lax.stop_gradient(logpt))
    if alpha is not None:
        at = jnp.asarray(alpha, jnp.float32)[labels.astype(jnp.int32)]
        logpt = logpt * at
    loss = -((1.0 - pt) ** gamma) * logpt
    return loss.mean()


def offset_l1_loss(pred_offsets: jnp.ndarray, target_offsets: jnp.ndarray,
                   labels: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 on per-point offsets, normalized by foreground count.

    Reference (of_l1_loss, loss.py:45-73): |pred - target| over points with
    label > 0, summed over (points, xyz) and divided by the per-keypoint
    foreground *point* count (+1e-3; the weight tensor has a trailing
    singleton so its sum is the point count, loss.py:57,66-68); the
    (bs, n_kpts) matrix is then .sum()'d by the trainer
    (train_ycb_pvn3d.py:176-181) — we return the same scalar sum.

    Args:
      pred_offsets: (B, n_kpts, N, 3).
      target_offsets: (B, N, n_kpts, 3) as produced by the datasets.
      labels: (B, N) per-point class ids (>0 = foreground).
    """
    w = (labels > 1e-8).astype(jnp.float32)           # (B, N)
    tgt = jnp.transpose(target_offsets, (0, 2, 1, 3))  # (B, n_kpts, N, 3)
    diff = jnp.abs(pred_offsets.astype(jnp.float32) - tgt.astype(jnp.float32))
    diff = diff * w[:, None, :, None]
    per_kp = diff.sum(axis=(2, 3))                    # (B, n_kpts)
    denom = w.sum(axis=1)[:, None] + 1e-3
    return (per_kp / denom).sum()


def seg_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-point classification accuracy (train_ycb_pvn3d.py:186-189)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == labels).astype(jnp.float32))
