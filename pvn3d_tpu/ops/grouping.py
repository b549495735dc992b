"""Ball query + feature grouping, TPU-native.

The reference's CUDA ball query scans points in index order and keeps the
first ``nsample`` indices with d^2 < radius^2, pre-filling all slots with the
first hit (pvn3d/_ext-src/src/ball_query_gpu.cu:26-43); grouping gathers
features by the (npoint, nsample) index table with atomicAdd scatter
gradients (group_points_gpu.cu:6-75).

Here the query streams the N points in fixed-size chunks under ``lax.scan``,
keeping a per-centroid hit counter and index buffer on-chip — the full
(npoint, N) distance matrix is never materialized in HBM.  The in-order
"first k within radius" semantics are reproduced exactly: within a chunk the
slot of point j is counter + (number of qualifying points before j), realized
with a cumulative sum and a dropped-out-of-range scatter.  Gathers are
``take_along_axis`` whose VJP is XLA's deterministic scatter-add.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "chunk"))
def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """For each centroid, indices of the first ``nsample`` points within
    ``radius`` (in point order), padded with the first hit.

    Args:
      radius: ball radius (strict d^2 < radius^2, ball_query_gpu.cu:34).
      nsample: max neighbors per centroid.
      xyz: (B, N, 3) support points.
      new_xyz: (B, m, 3) query centroids.

    Returns:
      (B, m, nsample) int32 indices; centroids with no hit get index 0
      (matching the reference's zero-initialized output buffer).
    """
    return jax.vmap(
        lambda x, c: _ball_query_single(x, c, radius, nsample, chunk)
    )(xyz, new_xyz)


def _ball_query_single(xyz, centroids, radius, nsample, chunk):
    n = xyz.shape[0]
    m = centroids.shape[0]
    r2 = jnp.float32(radius * radius)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0))) if pad else xyz
    # Padded points sit at +inf so they never qualify.
    valid = jnp.arange(n_chunks * chunk) < n
    c_sq = jnp.sum(centroids * centroids, axis=-1)          # (m,)

    def step(carry, chunk_idx):
        count, idx_buf = carry                              # (m,), (m, ns)
        start = chunk_idx * chunk
        pts = jax.lax.dynamic_slice(xyz_p, (start, 0), (chunk, 3))
        v = jax.lax.dynamic_slice(valid, (start,), (chunk,))
        p_sq = jnp.sum(pts * pts, axis=-1)                  # (chunk,)
        cross = centroids @ pts.T                           # (m, chunk)
        d2 = c_sq[:, None] - 2.0 * cross + p_sq[None, :]
        hit = (d2 < r2) & v[None, :]                        # (m, chunk)
        # Slot of each hit = prior count + #hits before it in this chunk.
        order = count[:, None] + jnp.cumsum(hit, axis=1) - 1
        j_ids = start + jax.lax.broadcasted_iota(jnp.int32, (m, chunk), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, chunk), 0)
        cols = jnp.where(hit & (order < nsample), order, nsample)  # ns==drop
        idx_buf = idx_buf.at[rows, cols].set(j_ids, mode="drop")
        count = count + jnp.sum(hit, axis=1).astype(jnp.int32)
        return (count, idx_buf), None

    count0 = jnp.zeros((m,), jnp.int32)
    buf0 = jnp.zeros((m, nsample), jnp.int32)
    (count, idx_buf), _ = jax.lax.scan(
        step, (count0, buf0), jnp.arange(n_chunks))
    # Pad trailing empty slots with the first hit (ball_query_gpu.cu:35-39).
    slots = jnp.arange(nsample)[None, :]
    first = idx_buf[:, 0:1]
    return jnp.where(slots < jnp.maximum(count[:, None], 1), idx_buf, first)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features by a grouping index table.

    (B, N, C), (B, m, ns) -> (B, m, ns, C), channels-last.  Differentiable;
    replaces the reference's atomicAdd backward (group_points_gpu.cu:60) with
    XLA's deterministic scatter-add.
    """
    b, n, c = points.shape
    _, m, ns = idx.shape
    flat = idx.reshape(b, m * ns, 1).astype(jnp.int32)
    out = jnp.take_along_axis(points, flat, axis=1)
    return out.reshape(b, m, ns, c)


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "use_xyz", "chunk"))
def query_and_group(radius: float, nsample: int, xyz: jnp.ndarray,
                    new_xyz: jnp.ndarray, features: jnp.ndarray | None = None,
                    use_xyz: bool = True, chunk: int = 2048) -> jnp.ndarray:
    """Fused ball query + grouping + centroid-centering.

    Semantics of the reference's QueryAndGroup module
    (pointnet2_utils.py:276-330): grouped xyz are centered on their centroid
    and concatenated with grouped features when ``use_xyz``.

    Returns: (B, m, ns, 3 + C) channels-last grouped features.
    """
    idx = ball_query(radius, nsample, xyz, new_xyz, chunk=chunk)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feat = group_points(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
        return grouped_feat
    if not use_xyz:
        raise ValueError("Cannot have no features and use_xyz=False")
    return grouped_xyz
