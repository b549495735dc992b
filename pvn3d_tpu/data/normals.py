"""Surface-normal estimation for RGB-D frames.

The reference runs PCL NormalEstimation with KSearch(50) per frame on the
unorganized cloud (pvn3d/datasets/ycb/ycb_dataset.py:147-157) — a C++
kd-tree per frame, a major reason it needs 60 loader workers.  Normals only
feed the network as 3 input features, so the replacement criterion is
feature quality, not bit parity.

Two estimators:

  * ``normals_from_depth_map`` — organized-grid normals from the (H, W)
    depth map: smooth the unprojected 3-D map, central-difference tangents,
    cross product, orient toward the camera.  Pure stencil math, O(HW),
    identical numpy / jnp implementations (the jnp one runs on-device so
    the TPU inference path needs no host normals at all).
  * ``knn_normals`` — PCA normals over k nearest neighbors (sklearn
    kd-tree), the closest match to PCL semantics; used as the oracle in
    tests and for unorganized offline clouds.
"""
from __future__ import annotations

import numpy as np


def knn_normals(points: np.ndarray, k: int = 50,
                viewpoint=(0.0, 0.0, 0.0)) -> np.ndarray:
    """PCA plane normals of each point's k-NN, oriented to the viewpoint.

    Semantics of PCL NormalEstimation + KSearch(k) (ycb_dataset.py:147-157):
    smallest eigenvector of the neighborhood covariance; flipped so
    n . (viewpoint - p) >= 0.  NaN-free: degenerate neighborhoods get 0.
    """
    from sklearn.neighbors import NearestNeighbors
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n == 0:
        return np.zeros((0, 3), np.float32)
    k = min(k, n)
    nn = NearestNeighbors(n_neighbors=k).fit(pts)
    _, idx = nn.kneighbors(pts)
    nbrs = pts[idx]                                   # (n, k, 3)
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / k
    # Smallest eigenvector of each 3x3 covariance.
    w, v = np.linalg.eigh(cov)
    normals = v[:, :, 0]
    to_view = np.asarray(viewpoint, np.float64)[None, :] - pts
    flip = np.sum(normals * to_view, axis=1) < 0
    normals[flip] *= -1.0
    normals[~np.isfinite(normals).all(axis=1)] = 0.0
    return normals.astype(np.float32)


def _box_blur(x: np.ndarray, r: int) -> np.ndarray:
    """Separable box blur with edge clamping (numpy)."""
    if r <= 0:
        return x
    pad = np.pad(x, ((r, r), (r, r)) + ((0, 0),) * (x.ndim - 2), mode="edge")
    c = np.cumsum(pad, axis=0)
    c = np.concatenate([c[:1] * 0, c], axis=0)
    x = (c[2 * r + 1:] - c[:-2 * r - 1]) / (2 * r + 1)
    c = np.cumsum(x, axis=1)
    c = np.concatenate([c[:, :1] * 0, c], axis=1)
    return (c[:, 2 * r + 1:] - c[:, :-2 * r - 1]) / (2 * r + 1)


def normals_from_depth_map(depth: np.ndarray, k: np.ndarray,
                           cam_scale: float = 1.0, smooth: int = 2,
                           depth_jump: float = 0.05,
                           impl: str = "auto") -> np.ndarray:
    """(H, W, 3) normals from an organized depth map.

    Central differences of the smoothed 3-D map give the surface tangents;
    their cross product gives the normal, oriented toward the camera.
    Differences across depth discontinuities (> ``depth_jump`` m) and
    invalid pixels are suppressed.

    ``impl``: "auto" prefers the native C++ twin (native/preprocess.cpp,
    ~25x this function; oracle-tested against it) with fallback here;
    "numpy" forces this implementation.
    """
    if impl == "auto":
        from pvn3d_tpu.native.preprocess import normals_from_depth_map_native
        native = normals_from_depth_map_native(
            depth if depth.ndim == 2 else depth.reshape(depth.shape[:2]),
            np.asarray(k, np.float32), cam_scale, smooth, depth_jump)
        if native is not None:
            return native
    h, w = depth.shape[:2]
    z = np.float32(depth).reshape(h, w) / cam_scale
    valid = z > 1e-6
    cols = np.arange(w, dtype=np.float32)[None, :]
    rows = np.arange(h, dtype=np.float32)[:, None]
    x = (cols - k[0, 2]) * z / k[0, 0]
    y = (rows - k[1, 2]) * z / k[1, 1]
    p = np.stack([x, y, z], axis=-1)

    if smooth:
        zs = _box_blur(np.where(valid, z, 0.0)[..., None], smooth)[..., 0]
        ws = _box_blur(valid.astype(np.float32)[..., None], smooth)[..., 0]
        z_sm = np.where(ws > 1e-6, zs / np.maximum(ws, 1e-6), z)
        p = np.stack([(cols - k[0, 2]) * z_sm / k[0, 0],
                      (rows - k[1, 2]) * z_sm / k[1, 1], z_sm], axis=-1)

    def diff(a, axis):
        fwd = np.roll(a, -1, axis=axis) - a
        bwd = a - np.roll(a, 1, axis=axis)
        return (fwd + bwd) * 0.5

    du = diff(p, 1)
    dv = diff(p, 0)
    # Suppress tangents across depth jumps.
    jump_u = np.abs(diff(z[..., None], 1)[..., 0]) > depth_jump
    jump_v = np.abs(diff(z[..., None], 0)[..., 0]) > depth_jump
    n = np.cross(dv, du)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(norm > 1e-12, n / np.maximum(norm, 1e-12), 0.0)
    # Orient toward the camera at the origin: n . p <= 0.
    flip = np.sum(n * p, axis=-1, keepdims=True) > 0
    n = np.where(flip, -n, n)
    bad = (~valid) | jump_u | jump_v
    n[bad] = 0.0
    return n.astype(np.float32)
