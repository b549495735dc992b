"""Native host-side components (C++, loaded via ctypes).

The reference builds its offline FPS as a cffi extension with a shell gcc
invocation (pvn3d/lib/utils/dataset_tools/fps/setup.py); here the shared
library compiles on demand next to the source and loads through ctypes,
with a numpy fallback when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fps.cpp")
_LIB = os.path.join(_DIR, "libpvn3d_fps.so")
_lib = None


def _build() -> bool:
    # Compile to a per-process temp and atomically rename: concurrent
    # first-use from spawned workers must never CDLL a half-written .so.
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            if os.path.exists(tmp):
                os.remove(tmp)
            return False
    os.replace(tmp, _LIB)
    return True


_lib_failed = False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            _lib_failed = True   # don't re-spawn g++ per call
            return None
    lib = ctypes.CDLL(_LIB)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.pvn3d_fps.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32,
                              ctypes.c_int32, i32p]
    lib.pvn3d_fps_center.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32,
                                     i32p]
    _lib = lib
    return lib


def _fps_numpy(pts: np.ndarray, sn: int, start: int) -> np.ndarray:
    pn = len(pts)
    min_dist = np.full(pn, np.inf, np.float32)
    idxs = np.zeros(sn, np.int32)
    cur = start % pn
    for s in range(sn):
        idxs[s] = cur
        min_dist[cur] = -1.0
        if s == sn - 1:
            break
        d = np.sum((pts - pts[cur]) ** 2, axis=1)
        sel = min_dist >= 0
        np.minimum(min_dist, d, where=sel, out=min_dist)
        cur = int(np.argmax(np.where(sel, min_dist, -1.0)))
    return idxs


def _fps_center_numpy(pts: np.ndarray, sn: int) -> np.ndarray:
    ctr = (pts.max(axis=0) + pts.min(axis=0)) / 2.0
    d = np.sum((pts - ctr) ** 2, axis=1)
    start = int(np.argmax(d))
    # Seed the min-dist cache with the center distances.
    pn = len(pts)
    min_dist = d.astype(np.float32).copy()
    idxs = np.zeros(sn, np.int32)
    cur = start
    for s in range(sn):
        idxs[s] = cur
        min_dist[cur] = -1.0
        if s == sn - 1:
            break
        dd = np.sum((pts - pts[cur]) ** 2, axis=1)
        sel = min_dist >= 0
        np.minimum(min_dist, dd, where=sel, out=min_dist)
        cur = int(np.argmax(np.where(sel, min_dist, -1.0)))
    return idxs


def farthest_point_sampling(pts: np.ndarray, sn: int,
                            init_center: bool = False,
                            seed: Optional[int] = 0) -> np.ndarray:
    """Select ``sn`` FPS points from a (pn, 3) cloud; returns their coords.

    Semantics of the reference wrapper (fps/fps_utils.py:8-23), with a
    reproducible explicit ``seed`` for the start index instead of
    srand(time(0)).
    """
    pts = np.ascontiguousarray(pts, np.float32)
    pn = len(pts)
    start = int(np.random.RandomState(seed).randint(pn)) if seed is not None \
        else 0
    lib = load_library()
    if lib is None:
        idxs = (_fps_center_numpy(pts, sn) if init_center
                else _fps_numpy(pts, sn, start))
        return pts[idxs]
    idxs = np.zeros(sn, np.int32)
    if init_center:
        lib.pvn3d_fps_center(pts, pn, sn, idxs)
    else:
        lib.pvn3d_fps(pts, pn, sn, start, idxs)
    return pts[idxs]
