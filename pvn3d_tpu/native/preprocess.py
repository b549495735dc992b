"""ctypes loader for the native preprocessing library (preprocess.cpp).

Same build-on-demand pattern as the FPS extension (native/__init__.py): the
shared library compiles next to the source on first use and the callers
(data/depth_completion.py, data/normals.py) silently fall back to the
numpy oracles when no compiler is available.

Thread count: loader workers are separate processes on a small host, so the
kernels default to 1 OpenMP thread; set PVN3D_NATIVE_THREADS to use more in
single-process contexts.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_LIB = os.path.join(_DIR, "libpvn3d_preprocess.so")
_lib = None
_lib_failed = False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        # Concurrent first-use (spawned loader workers) races on _LIB:
        # compile to a per-process temp name and atomically rename, so a
        # sibling's CDLL never sees a partially-written file.  Losing a
        # duplicate build to the rename is harmless.
        tmp = f"{_LIB}.{os.getpid()}.tmp"
        built = False
        for extra in (["-march=native", "-fopenmp"], ["-fopenmp"], []):
            try:
                subprocess.run(["g++", "-O3", *extra, "-shared", "-fPIC",
                                _SRC, "-o", tmp], check=True,
                               capture_output=True)
                built = True
                break
            except (OSError, subprocess.CalledProcessError):
                continue
        if not built:
            if os.path.exists(tmp):
                os.remove(tmp)
            _lib_failed = True
            return None
        os.replace(tmp, _LIB)
    lib = ctypes.CDLL(_LIB)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = ctypes.c_int32
    f32 = ctypes.c_float
    lib.pvn3d_fill_multiscale.argtypes = [
        f32p, i32, i32, f32, f32, f32, i32, i32, f32p]
    lib.pvn3d_normals_from_depth.argtypes = [
        f32p, i32, i32, f32p, f32, i32, f32, f32p]
    _lib = lib
    return lib


def fill_in_multiscale_native(depth: np.ndarray, max_depth: float = 3.0,
                              near_bin: float = 1.0, med_bin: float = 2.0,
                              blur_type: str = "bilateral",
                              extrapolate: bool = False
                              ) -> Optional[np.ndarray]:
    """Native twin of depth_completion.fill_in_multiscale; None when the
    library is unavailable or the blur type has no native path."""
    lib = load_library()
    blur_mode = {"none": 0, "bilateral": 2}.get(blur_type)
    if lib is None or blur_mode is None:
        return None
    d = np.ascontiguousarray(depth, np.float32)
    out = np.empty_like(d)
    lib.pvn3d_fill_multiscale(d, d.shape[0], d.shape[1], max_depth,
                              near_bin, med_bin, int(extrapolate),
                              blur_mode, out)
    return out


def normals_from_depth_map_native(depth: np.ndarray, k: np.ndarray,
                                  cam_scale: float = 1.0, smooth: int = 2,
                                  depth_jump: float = 0.05
                                  ) -> Optional[np.ndarray]:
    """Native twin of normals.normals_from_depth_map; None when the library
    is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    d = np.ascontiguousarray(depth, np.float32)
    km = np.ascontiguousarray(k, np.float32).reshape(9)
    out = np.empty((d.shape[0], d.shape[1], 3), np.float32)
    lib.pvn3d_normals_from_depth(d, d.shape[0], d.shape[1], km,
                                 cam_scale, smooth, depth_jump, out)
    return out
