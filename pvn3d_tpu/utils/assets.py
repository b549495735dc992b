"""Loaders for per-object numeric assets (keypoints, corners, diameters).

The reference reads these through ``Basic_Utils.get_kps/get_ctr``
(pvn3d/lib/utils/basic_utils.py:542-595) with per-process caches.  Here the
assets are vendored data files under ``pvn3d_tpu/assets`` (regenerable with
``tools/gen_obj_info.py`` from the meshes) and loaded through cached pure
functions.
"""
from __future__ import annotations

import functools
import os
import re
from typing import Tuple

import numpy as np

from pvn3d_tpu import config as C


def _kps_dir(ds_type: str) -> str:
    sub = "ycb_object_kps" if ds_type == "ycb" else "lm_obj_kps"
    return os.path.join(C.ASSETS_DIR, sub)


def _cls_name(cls, ds_type: str) -> str:
    if isinstance(cls, (int, np.integer)):
        if ds_type == "ycb":
            return C.YCB_CLASSES[int(cls) - 1]
        return C.LM_ID2OBJ[int(cls)]
    return cls


@functools.lru_cache(maxsize=None)
def get_kps(cls, kp_type: str = "farthest", ds_type: str = "ycb") -> np.ndarray:
    """Load the (n_kps, 3) FPS keypoints of an object, in meters.

    ``kp_type`` selects the keypoint count file: "farthest" (8),
    "farthest4/12/16/20" (reference: ycb_dataset.py:263-267).
    """
    name = _cls_name(cls, ds_type)
    path = os.path.join(_kps_dir(ds_type), name, f"{kp_type}.txt")
    return np.loadtxt(path, dtype=np.float32).reshape(-1, 3)


@functools.lru_cache(maxsize=None)
def get_corners(cls, ds_type: str = "ycb") -> np.ndarray:
    name = _cls_name(cls, ds_type)
    path = os.path.join(_kps_dir(ds_type), name, "corners.txt")
    return np.loadtxt(path, dtype=np.float32).reshape(-1, 3)


@functools.lru_cache(maxsize=None)
def get_ctr(cls, ds_type: str = "ycb") -> np.ndarray:
    """Object center = mean of bbox corners (reference: basic_utils.py:583)."""
    return get_corners(cls, ds_type).mean(axis=0)


@functools.lru_cache(maxsize=None)
def lm_diameters() -> dict:
    """LineMOD object diameters in mm, from models_info.yml.

    Reference reads this via yaml (common.py:131-133); the file is flat
    enough to parse directly without a yaml dependency on the hot path.
    """
    path = os.path.join(C.ASSETS_DIR, "lm_config", "models_info.yml")
    out = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"^(\d+):.*?diameter:\s*([0-9.eE+-]+)", line)
            if m:
                out[int(m.group(1))] = float(m.group(2))
    return out


@functools.lru_cache(maxsize=None)
def ycb_class_list() -> Tuple[str, ...]:
    return C.YCB_CLASSES


def load_mesh_points(root: str, cls, ds_type: str = "ycb",
                     max_points: int = 0, seed: int = 0) -> np.ndarray:
    """Load an object mesh point cloud from a dataset checkout.

    YCB: ``models/<cls>/points.xyz``; LineMOD: ``models/obj_XX.ply`` vertices
    scaled mm->m and subsampled to 2000 points (reference:
    basic_utils.py:497-519).
    """
    name = _cls_name(cls, ds_type)
    if ds_type == "ycb":
        path = os.path.join(root, "models", name, "points.xyz")
        pts = np.loadtxt(path, dtype=np.float32)
    else:
        path = os.path.join(root, "models", "obj_%02d.ply" % int(cls))
        pts = read_ply_vertices(path) / 1000.0
        if max_points <= 0:
            max_points = 2000
    if max_points and len(pts) > max_points:
        rng = np.random.RandomState(seed)
        sel = rng.choice(len(pts), max_points, replace=False)
        pts = pts[sel]
    return pts.astype(np.float32)


def stacked_mesh_kps(ds_type: str = "ycb", n_cls: int = 22,
                     kp_type: str = "farthest") -> np.ndarray:
    """(n_cls, n_kps+1, 3): per-class mesh keypoints + center, row 0 zero.

    The canonical targets the clustered votes are fit against
    (reference: cal_frame_poses, pvn3d_eval_utils.py:99-103).
    """
    rows = []
    for cls_id in range(1, n_cls):
        kps = get_kps(cls_id, kp_type=kp_type, ds_type=ds_type)
        ctr = get_ctr(cls_id, ds_type=ds_type).reshape(1, 3)
        rows.append(np.concatenate([kps, ctr], axis=0))
    out = np.stack(rows, axis=0)
    return np.concatenate([np.zeros((1,) + out.shape[1:], np.float32), out],
                          axis=0).astype(np.float32)


def stacked_class_radii(ds_type: str = "ycb", n_cls: int = 22) -> np.ndarray:
    """(n_cls,) per-class cluster radii, row 0 unused (reference:
    config.ycb_r_lst, pvn3d/common.py:80)."""
    if ds_type == "ycb":
        return np.concatenate(
            [[1.0], np.asarray(C.YCB_RADII, np.float32)]).astype(np.float32)
    return np.ones((n_cls,), np.float32)


def stacked_mesh_points(root: str, ds_type: str = "ycb", n_cls: int = 22,
                        max_points: int = 2600,
                        seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """(n_cls, M, 3) padded per-class mesh clouds + (n_cls, M) validity.

    Loaded from a dataset checkout (reference: get_pointxyz,
    basic_utils.py:497-519; LineMOD subsampled to 2000 points there).
    """
    pts_list = [np.zeros((0, 3), np.float32)]
    for cls_id in range(1, n_cls):
        pts_list.append(load_mesh_points(root, cls_id, ds_type=ds_type,
                                         max_points=max_points, seed=seed))
    m = max(max(len(p) for p in pts_list), 1)
    out = np.zeros((n_cls, m, 3), np.float32)
    valid = np.zeros((n_cls, m), bool)
    for i, p in enumerate(pts_list):
        out[i, :len(p)] = p
        valid[i, :len(p)] = True
    return out, valid


def read_ply_vertices(path: str) -> np.ndarray:
    """Minimal ascii/binary-little-endian PLY vertex reader."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        n_vertex = 0
        fmt = "ascii"
        props = []
        in_vertex = False
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n_vertex = int(parts[2])
            elif parts[0] == "property" and in_vertex:
                props.append((parts[1], parts[2]))
        if fmt == "ascii":
            rows = [f.readline().split()[:3] for _ in range(n_vertex)]
            return np.array(rows, dtype=np.float32)
        type_map = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
            "uint": "u4", "uint32": "u4",
        }
        endian = ">" if "big_endian" in fmt else "<"
        dt = np.dtype([(n, endian + type_map[t]) for t, n in props])
        data = np.frombuffer(f.read(dt.itemsize * n_vertex), dtype=dt)
        return np.stack(
            [data["x"], data["y"], data["z"]], axis=1).astype(np.float32)
