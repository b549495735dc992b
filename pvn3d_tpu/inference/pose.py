"""Frame poses from per-point votes: the batched perceive->vote->cluster->fit
stage.

Reference pipeline (pvn3d/lib/utils/pvn3d_eval_utils.py:37-110
``cal_frame_poses`` / :156-201 ``cal_frame_poses_lm``): sequential per-class
center MeanShift, center-distance mask refinement (YCB), per-keypoint
MeanShift, then a CPU SVD fit per class — all inside Python loops over a
thread pool.  Here the whole frame is one fixed-shape XLA program:

  1. per-class point selection: up to K evenly-strided class points
     (the reference clusters all class points; even striding keeps the mode
     statistics when a class exceeds K);
  2. all (class, center) problems -> one batched MeanShift;
  3. vectorized center-distance mask refinement (:59-72);
  4. all (class, keypoint+center) problems -> one batched MeanShift;
  5. batched weighted Umeyama fit against the canonical mesh keypoints.

Empty/absent-class semantics kept exactly: a class absent from the predicted
mask gets a ZERO pose (eval_metric:121-123 uses zeros(3,4) when the class is
missing from pred_cls_ids); a class that was predicted but lost all points to
mask refinement gets the IDENTITY pose (:79-81).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pvn3d_tpu.geometry.se3 import best_fit_transform, identity_pose
from pvn3d_tpu.inference.meanshift import mean_shift_fit


class FramePoses(NamedTuple):
    poses: jnp.ndarray      # (n_cls, 3, 4) — row 0 unused (background)
    present: jnp.ndarray    # (n_cls,) bool — class in predicted mask
    kps: jnp.ndarray        # (n_cls, n_kps+1, 3) clustered keypoints+center


def _select_class_points(mask: jnp.ndarray, n_cls: int, k: int):
    """Evenly-strided selection of up to k points per foreground class.

    Returns sel (n_cls-1, k) indices into N, valid (n_cls-1, k) bool,
    count (n_cls-1,) int32.
    """
    n = mask.shape[0]
    classes = jnp.arange(1, n_cls, dtype=mask.dtype)

    # Stable-sort formulation: sorting point indices by class (background
    # keyed last) makes each class a contiguous run, so "the p-th class
    # point in index order" is one gather at ``offset[cls] + p``.  This
    # replaced a rank-table scatter (12288-element .at[].set — 0.32 ms
    # on-chip; one 32-bit key sort is 0.08 ms), which itself replaced a
    # per-class searchsorted (1.5 ms).  The function runs twice per frame
    # (before and after mask refinement).  Invalid slots (p >= count) read
    # a clamped position inside the sorted array; every consumer masks
    # them via ``valid``.
    oh = mask[:, None] == classes[None, :]                 # (N, nf)
    count = jnp.sum(oh.astype(jnp.int32), axis=0)          # (nf,)
    key = jnp.where(mask > 0, mask.astype(jnp.int32), jnp.int32(n_cls))
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(count)[:-1]])

    ar = jnp.arange(k, dtype=jnp.int32)
    # Exact integer striding (the previous f32 form loses ulps past
    # ar * count ~ 2^24; int32 is exact for k * n < 2^31).
    strided = (ar[None, :] * count[:, None]) // k
    pos = jnp.where(count[:, None] > k, strided, ar[None, :])
    sel = order[jnp.clip(offsets[:, None] + pos, 0, n - 1)]
    valid = ar[None, :] < jnp.minimum(count, k)[:, None]
    return sel, valid, count


@functools.partial(
    jax.jit,
    static_argnames=("n_cls", "n_kps", "k", "bandwidth", "max_iter",
                     "use_ctr", "use_ctr_clus_filter", "refine_mask",
                     "chunk"))
def cal_frame_poses(pcld: jnp.ndarray, mask: jnp.ndarray,
                    ctr_of: jnp.ndarray, kp_of: jnp.ndarray,
                    mesh_kps: jnp.ndarray, radii: jnp.ndarray,
                    n_cls: int, n_kps: int = 8, k: int = 512,
                    bandwidth: float = 0.08, max_iter: int = 300,
                    use_ctr: bool = True, use_ctr_clus_filter: bool = True,
                    refine_mask: bool = True, chunk: int = 16) -> FramePoses:
    """Single-frame pose extraction (vmap over frames for a batch).

    Args:
      pcld: (N, 3) camera-frame points.
      mask: (N,) int32 predicted per-point class.
      ctr_of: (1, N, 3) predicted center offsets.
      kp_of: (n_kps, N, 3) predicted keypoint offsets.
      mesh_kps: (n_cls, n_kps+1, 3) canonical mesh keypoints + center
        (row 0 arbitrary).
      radii: (n_cls,) per-class cluster radius for mask refinement
        (row 0 unused; reference: config.ycb_r_lst, pvn3d_eval_utils.py:69).
      refine_mask: YCB center-distance mask refinement (:51-72); the LineMOD
        path (cal_frame_poses_lm) never refines.
    """
    n = pcld.shape[0]
    nf = n_cls - 1
    pred_ctr = pcld - ctr_of[0]                       # (N, 3)
    pred_kp = pcld[None, :, :] - kp_of                # (n_kps, N, 3)

    sel, valid, count = _select_class_points(mask, n_cls, k)
    present = count > 0                               # in pred_cls_ids

    if refine_mask and use_ctr_clus_filter:
        ctr_votes = pred_ctr[sel]                     # (nf, k, 3)
        ctrs, _, _ = mean_shift_fit(ctr_votes, valid, bandwidth,
                                    max_iter=max_iter, chunk=chunk)
        # Reassign foreground points to the nearest predicted-class center
        # when within 0.8 * class radius (reference :59-72).
        d = jnp.linalg.norm(pred_ctr[:, None, :] - ctrs[None, :, :],
                            axis=-1)                  # (N, nf)
        d = jnp.where(present[None, :], d, jnp.inf)
        closest = jnp.argmin(d, axis=1)               # (N,) in [0, nf)
        min_dis = jnp.min(d, axis=1)
        closest_cls = (closest + 1).astype(mask.dtype)
        thresh = radii[closest_cls] * 0.8
        update = (mask > 0) & (min_dis < thresh) & jnp.isfinite(min_dis)
        mask = jnp.where(update, closest_cls, mask)
        sel, valid, count = _select_class_points(mask, n_cls, k)

    # Round B: center + keypoint clustering for every class at once.
    ctr_votes = pred_ctr[sel]                         # (nf, k, 3)
    ctr_centers, ctr_labels, _ = mean_shift_fit(
        ctr_votes, valid, bandwidth, max_iter=max_iter, chunk=chunk)
    # if ctr_labels.sum() < 1: ctr_labels[0] = 1  (reference :85-86)
    no_lab = jnp.sum(ctr_labels, axis=1) < 1
    ctr_labels = ctr_labels.at[:, 0].set(ctr_labels[:, 0] | no_lab)

    kp_valid = valid & ctr_labels if use_ctr_clus_filter else valid
    # (nf, n_kps, k, 3): keypoint votes of the selected class points.
    kp_votes = jnp.transpose(pred_kp[:, sel, :], (1, 0, 2, 3))
    kp_flat = kp_votes.reshape(nf * n_kps, k, 3)
    kpv_flat = jnp.broadcast_to(kp_valid[:, None, :],
                                (nf, n_kps, k)).reshape(nf * n_kps, k)
    kp_centers, _, _ = mean_shift_fit(kp_flat, kpv_flat, bandwidth,
                                      max_iter=max_iter, chunk=chunk)
    kp_centers = kp_centers.reshape(nf, n_kps, 3)

    if use_ctr:
        cls_kps = jnp.concatenate([kp_centers, ctr_centers[:, None, :]],
                                  axis=1)             # (nf, n_kps+1, 3)
    else:
        cls_kps = kp_centers

    fit = best_fit_transform(mesh_kps[1:, :cls_kps.shape[1], :], cls_kps)

    # Predicted-but-empty-after-refinement -> identity (:79-81); absent ->
    # zeros (eval_metric:121-123 gathers a zero pose for missing classes).
    empty = count < 1
    ident = identity_pose((nf,))
    poses_f = jnp.where(empty[:, None, None], ident, fit)
    poses_f = jnp.where(present[:, None, None], poses_f, 0.0)
    poses = jnp.concatenate(
        [jnp.zeros((1, 3, 4), jnp.float32), poses_f], axis=0)
    present_full = jnp.concatenate(
        [jnp.zeros((1,), bool), present], axis=0)
    kps_full = jnp.concatenate(
        [jnp.zeros((1,) + cls_kps.shape[1:], jnp.float32), cls_kps], axis=0)
    return FramePoses(poses=poses, present=present_full, kps=kps_full)
