"""Batched point-to-point ICP refinement.

Reference: eval_icp.py + lib/utils/icp/icp.py — per-object sequential ICP
with an sklearn 1-NN per iteration inside a ProcessPoolExecutor(10).  Here
every (frame, object) refinement problem is one row of a batched, masked,
fixed-shape program: brute-force NN on the MXU (meshes are <= 2000 points,
scene clusters capped at 2000 — eval_icp.py:36,131-135), batched Umeyama
fit per iteration, ``lax.while_loop`` with per-problem convergence flags.

Reference semantics kept (icp.py:141-192):
  * correspondence direction is scene -> source: every SCENE point matches
    its nearest transformed-mesh point (icp.py:174);
  * the incremental fit maps the matched source points onto the scene;
  * stop when |prev_err - err| < tolerance (per problem) or max_iter;
  * the pose accumulates from ``init_pose``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pvn3d_tpu.geometry.se3 import best_fit_transform, transform_points
from pvn3d_tpu.inference.meanshift import mean_shift_fit


def compose_poses(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) composition: result = a ∘ b (apply b first)."""
    r = jnp.einsum("...ij,...jk->...ik", a[..., :3, :3], b[..., :3, :3])
    t = jnp.einsum("...ij,...j->...i", a[..., :3, :3], b[..., :3, 3]) \
        + a[..., :3, 3]
    return jnp.concatenate([r, t[..., :, None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def icp_refine(mesh_pts: jnp.ndarray, mesh_valid: jnp.ndarray,
               scene_pts: jnp.ndarray, scene_valid: jnp.ndarray,
               init_pose: jnp.ndarray, max_iter: int = 500,
               tolerance: float = 1e-9):
    """Refine a batch of initial poses against scene point clusters.

    Args:
      mesh_pts: (B, M, 3) canonical mesh points (padded).
      mesh_valid: (B, M) bool.
      scene_pts: (B, K, 3) camera-frame scene points (padded).
      scene_valid: (B, K) bool.
      init_pose: (B, 3, 4) initial poses (e.g. PVN3D predictions).
      max_iter / tolerance: reference values 500 / 1e-9 (eval_icp.py:181).

    Returns:
      (poses (B, 3, 4), mean_err (B,), n_iter (B,)).
    """
    mesh_pts = mesh_pts.astype(jnp.float32)
    scene_pts = scene_pts.astype(jnp.float32)
    big = jnp.float32(1e12)
    sc_w = scene_valid.astype(jnp.float32)
    sc_n = jnp.maximum(sc_w.sum(axis=-1), 1e-9)

    def nn_match(pose):
        src = transform_points(pose, mesh_pts)             # (B, M, 3)
        src_sq = jnp.sum(src * src, axis=-1)
        src_sq = jnp.where(mesh_valid, src_sq, big)
        cross = jnp.einsum("bkc,bmc->bkm", scene_pts, src,
                           preferred_element_type=jnp.float32)
        sc_sq = jnp.sum(scene_pts * scene_pts, axis=-1)
        d2 = sc_sq[..., None] - 2.0 * cross + src_sq[:, None, :]
        idx = jnp.argmin(d2, axis=-1)                      # (B, K)
        mind = jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]
        matched = jnp.take_along_axis(src, idx[..., None], axis=1)
        return matched, jnp.sqrt(jnp.maximum(mind, 0.0))

    def cond(carry):
        _, _, active, it, _ = carry
        return jnp.any(active) & (it < max_iter)

    def body(carry):
        pose, prev_err, active, it, _ = carry
        matched, dist = nn_match(pose)
        err = jnp.sum(dist * sc_w, axis=-1) / sc_n         # (B,)
        inc = best_fit_transform(matched, scene_pts, weights=sc_w)
        new_pose = compose_poses(inc, pose)
        pose = jnp.where(active[:, None, None], new_pose, pose)
        still = jnp.abs(prev_err - err) >= tolerance
        active = active & still
        return pose, err, active, it + 1, err

    b = mesh_pts.shape[0]
    init = (init_pose.astype(jnp.float32),
            jnp.zeros((b,), jnp.float32),
            jnp.ones((b,), bool), jnp.int32(0),
            jnp.zeros((b,), jnp.float32))
    pose, _, _, n_iter, err = jax.lax.while_loop(cond, body, init)
    return pose, err, jnp.broadcast_to(n_iter, (b,))


@functools.partial(jax.jit, static_argnames=("max_iter", "chunk"))
def biggest_cluster_mask(points: jnp.ndarray, valid: jnp.ndarray,
                         bandwidth: float = 0.06, max_iter: int = 300,
                         chunk: int = 8) -> jnp.ndarray:
    """Membership mask of the dominant MeanShift cluster per point set.

    Reference: get_cld_bigest_clus (eval_icp.py:56-64, sklearn MeanShift
    bandwidth 0.06, keep cluster 0 == biggest).
    """
    _, labels, _ = mean_shift_fit(points, valid, bandwidth,
                                  max_iter=max_iter, chunk=chunk)
    return labels & valid


def refine_frame_poses(init_poses, mesh_pts, mesh_valid, scene_pts,
                       scene_valid, min_points: int = 1500,
                       cluster_bandwidth: float = 0.06,
                       max_iter: int = 500, tolerance: float = 1e-9,
                       use_cluster_filter: bool = True):
    """Per-class refinement with the reference's gating: classes with fewer
    than ``min_points`` scene points keep their initial pose
    (eval_icp.py:146-151); the scene cloud is prefiltered to its biggest
    cluster (:56-64).

    All args batched over classes: (C, ...) arrays.
    """
    if use_cluster_filter:
        scene_valid = biggest_cluster_mask(
            scene_pts, scene_valid, bandwidth=cluster_bandwidth)
    refined, err, iters = icp_refine(
        mesh_pts, mesh_valid, scene_pts, scene_valid, init_poses,
        max_iter=max_iter, tolerance=tolerance)
    n_pts = jnp.sum(scene_valid, axis=-1)
    keep = n_pts >= min_points
    poses = jnp.where(keep[:, None, None], refined, init_poses)
    return poses, err, iters
