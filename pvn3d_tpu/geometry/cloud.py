"""Depth-map <-> point-cloud geometry (unprojection, projection).

Replaces the reference's numpy index-map unprojection
(pvn3d/lib/utils/basic_utils.py:381-399 ``dpt_2_cld``) and projection
(:306-313 ``project_p3d``) with jit-able jnp versions operating on the full
(H, W) grid with masks, so they also run on-device inside the inference
pipeline.  Note the reference's axis quirk: its ``xmap`` indexes rows and
``ymap`` columns, so x = (col - cx) * z / fx uses the *column* map named
``ymap``; here we use row/col names directly with identical math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def depth_to_cloud_map(depth: jnp.ndarray, k: jnp.ndarray,
                       cam_scale: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unproject a (H, W) depth map to a (H, W, 3) camera-frame cloud.

    Returns (cloud_map, valid_mask) where valid = depth > 1e-6 (reference's
    msk_dp, basic_utils.py:384).
    """
    h, w = depth.shape
    z = depth.astype(jnp.float32) / cam_scale
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = (cols - k[0, 2]) * z / k[0, 0]
    y = (rows - k[1, 2]) * z / k[1, 1]
    cloud = jnp.stack([x, y, z], axis=-1)
    return cloud, depth > 1e-6


def depth_to_cloud(depth: np.ndarray, k: np.ndarray,
                   cam_scale: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Host-side unprojection returning only valid points + flat indices.

    Semantics of ``dpt_2_cld`` (basic_utils.py:381-399): returns
    (cloud (M, 3), choose (M,) flat pixel indices) for pixels with depth.
    """
    if depth.ndim > 2:
        depth = depth[..., 0]
    h, w = depth.shape
    msk = depth > 1e-6
    choose = np.flatnonzero(msk.ravel()).astype(np.int64)
    if choose.size == 0:
        return None, None
    z = depth.ravel()[choose].astype(np.float32) / cam_scale
    col = (choose % w).astype(np.float32)
    row = (choose // w).astype(np.float32)
    x = (col - k[0, 2]) * z / k[0, 0]
    y = (row - k[1, 2]) * z / k[1, 1]
    return np.stack([x, y, z], axis=1), choose


def project_points(p3d: jnp.ndarray, k: jnp.ndarray,
                   cam_scale: float = 1.0) -> jnp.ndarray:
    """Project (..., N, 3) camera-frame points to integer pixel coords.

    Reference: basic_utils.py:306-313 (project_p3d).
    """
    p3d = p3d * cam_scale
    uvw = jnp.einsum("...nc,dc->...nd", p3d, jnp.asarray(k, jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    # Sign-preserving divisor guard: the reference divides by z directly,
    # so points behind the camera mirror (negative z) rather than blow up
    # toward +inf; only |z| ~ 0 is clamped to avoid inf/nan.
    z = uvw[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-9,
                  jnp.where(z < 0, -1e-9, 1e-9), z)
    uv = uvw[..., :2] / z
    return jnp.round(uv).astype(jnp.int32)
