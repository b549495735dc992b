"""Rigid-transform estimation and application (pure jnp, batch-first).

TPU-native replacement for the reference's numpy/torch Umeyama fit
(pvn3d/lib/utils/basic_utils.py:47-80 and :637-669).  Everything here is
jit-able and batched: poses are (..., 3, 4) arrays, point sets are
(..., N, 3).  Weighted variants support the masked/padded fixed-shape style
the rest of the framework uses instead of ragged Python loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Pose estimation runs in f32 end-to-end: the TPU MXU's default matmul
# precision truncates f32 operands to bf16 (~2^-9 relative), which rotates
# fitted poses by ~0.2% and shifts transformed points by millimeters —
# material against mm-scale ADD metrics.  Every contraction here is tiny
# (3x3 outputs or K=3), so full precision is free.
_HI = jax.lax.Precision.HIGHEST


def best_fit_transform(src: jnp.ndarray, dst: jnp.ndarray,
                       weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Least-squares rigid transform mapping ``src`` onto ``dst``.

    Umeyama without scale, with the reflection fix (det(R) < 0 flips the last
    row of Vt; reference semantics: basic_utils.py:60-74).  Supports leading
    batch dimensions and optional per-point weights (for padded point sets).

    Args:
      src: (..., N, 3) source points (e.g. canonical mesh keypoints).
      dst: (..., N, 3) target points (e.g. clustered votes in camera frame).
      weights: optional (..., N) nonnegative weights; zero-weight rows are
        ignored.  If all-zero, returns an identity-rotation zero-translation
        pose.

    Returns:
      (..., 3, 4) pose [R | t] with dst ~= src @ R^T + t.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    if weights is None:
        w = jnp.ones(src.shape[:-1], jnp.float32)
    else:
        w = jnp.asarray(weights, jnp.float32)
    wsum = jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-12)
    wn = w / wsum                                     # (..., N)

    centroid_src = jnp.einsum("...n,...nc->...c", wn, src, precision=_HI)
    centroid_dst = jnp.einsum("...n,...nc->...c", wn, dst, precision=_HI)
    src_c = src - centroid_src[..., None, :]
    dst_c = dst - centroid_dst[..., None, :]

    # Cross-covariance H = src_c^T diag(w) dst_c  (3x3), batched.
    h = jnp.einsum("...nc,...n,...nd->...cd", src_c, wn, dst_c,
                   precision=_HI)
    u, _, vt = jnp.linalg.svd(h)
    # Reflection fix: flip the last singular vector when det < 0.
    det = jnp.linalg.det(jnp.einsum("...ij,...kj->...ik",
                                    _transpose(vt), _transpose(u),
                                    precision=_HI))
    sign = jnp.sign(det)
    sign = jnp.where(sign == 0, 1.0, sign)
    d = jnp.ones(vt.shape[:-2] + (3,), jnp.float32)
    d = d.at[..., -1].set(sign)
    r = jnp.einsum("...ji,...j,...jk->...ik", vt, d, _transpose(u),
                   precision=_HI)
    t = centroid_dst - jnp.einsum("...ij,...j->...i", r, centroid_src,
                                  precision=_HI)
    return jnp.concatenate([r, t[..., :, None]], axis=-1)


def _transpose(x):
    return jnp.swapaxes(x, -1, -2)


def transform_points(pose: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 3, 4) pose to (..., N, 3) points."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return jnp.einsum("...nc,...dc->...nd", pts, r,
                      precision=_HI) + t[..., None, :]


def compose_rt(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Stack rotation (..., 3, 3) and translation (..., 3) into (..., 3, 4)."""
    return jnp.concatenate([r, t[..., :, None]], axis=-1)


def identity_pose(batch_shape=()) -> jnp.ndarray:
    """Identity [I | 0] pose, matching the reference's fallback for empty
    classes (np.identity(4)[:3,:], pvn3d_eval_utils.py:80)."""
    eye = jnp.concatenate(
        [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)],
        axis=1)
    return jnp.broadcast_to(eye, tuple(batch_shape) + (3, 4))


def random_pose(key, max_trans: float = 1.0) -> jnp.ndarray:
    """Uniform random rotation (via normalized quaternion) + translation.

    Test helper for property tests (SE(3) roundtrips).
    """
    kq, kt = jax.random.split(key)
    q = jax.random.normal(kq, (4,))
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q
    r = jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    t = jax.random.uniform(kt, (3,), minval=-max_trans, maxval=max_trans)
    return compose_rt(r, t)
