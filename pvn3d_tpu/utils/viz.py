"""Visualization helpers: pose projection overlays, label colors.

Reference: Basic_Utils.project_p3d / draw_p2ds / get_label_color
(pvn3d/lib/utils/basic_utils.py:306-379), used by demo.py to render
predicted poses into the image.
"""
from __future__ import annotations

import numpy as np


def project_points_np(p3d: np.ndarray, k: np.ndarray,
                      cam_scale: float = 1.0) -> np.ndarray:
    """(N, 3) camera-frame points -> (N, 2) integer pixel coords."""
    p = np.asarray(p3d, np.float64) * cam_scale
    uvw = p @ np.asarray(k, np.float64).T
    uv = uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-9)
    return np.round(uv).astype(np.int32)


def label_color(cls_id: int) -> tuple:
    """Deterministic distinct color per class id (BGR-ish tuple)."""
    rng = np.random.RandomState(cls_id * 7919 + 13)
    c = rng.randint(60, 255, 3)
    return int(c[0]), int(c[1]), int(c[2])


def draw_points(img: np.ndarray, p2ds: np.ndarray, color: tuple,
                radius: int = 1) -> np.ndarray:
    """Draw projected points on a (H, W, 3) uint8 image (in place)."""
    h, w = img.shape[:2]
    ok = (p2ds[:, 0] >= 0) & (p2ds[:, 0] < w) & \
         (p2ds[:, 1] >= 0) & (p2ds[:, 1] < h)
    pts = p2ds[ok]
    if radius <= 1:
        img[pts[:, 1], pts[:, 0]] = color
    else:
        import cv2
        for x, y in pts:
            cv2.circle(img, (int(x), int(y)), radius, color, -1)
    return img


def draw_pose_mesh(img: np.ndarray, mesh_pts: np.ndarray, pose: np.ndarray,
                   k: np.ndarray, cls_id: int = 1,
                   cam_scale: float = 1.0) -> np.ndarray:
    """Project a mesh under ``pose`` and scatter it on the image
    (demo.py:122-146 behavior)."""
    cam = mesh_pts @ np.asarray(pose)[:, :3].T + np.asarray(pose)[:, 3]
    p2ds = project_points_np(cam, k, cam_scale)
    return draw_points(img, p2ds, label_color(cls_id))
