"""Depth-map completion (host-side, numpy/cv2).

Capability match for the vendored ip_basic multiscale fill the reference
runs once per YCB frame (pvn3d/lib/utils/ip_basic/ip_basic/
depth_map_utils_ycb.py:290-445, wrapped by Basic_Utils.fill_missing,
basic_utils.py:436-456 with max_depth=3.0).  The algorithm: invert valid
depths, depth-binned dilation with cross kernels (near 7 / med 5 / far 3),
morphological closure, median de-noising, masked hole filling below the
per-column top valid pixel, median + bilateral smoothing, invert back.

Differences from the reference implementation (same algorithm, different
realization): the per-column top-mask python loops are vectorized, and the
YCB depth bins (<=1 m near, 1-2 m med, >2 m far) are explicit parameters.
"""
from __future__ import annotations

import cv2
import numpy as np

_VALID_EPS = 0.01


def _cross_kernel(size: int) -> np.ndarray:
    k = np.zeros((size, size), np.uint8)
    k[size // 2, :] = 1
    k[:, size // 2] = 1
    return k


def _full_kernel(size: int) -> np.ndarray:
    return np.ones((size, size), np.uint8)


def _top_valid_mask(depth: np.ndarray) -> np.ndarray:
    """True at/below the first valid pixel of each column (vectorized form
    of the reference's per-column loop, depth_map_utils_ycb.py:366-372)."""
    valid = depth > _VALID_EPS
    top_row = np.argmax(valid, axis=0)            # 0 when column is empty
    rows = np.arange(depth.shape[0])[:, None]
    return rows >= top_row[None, :]


def fill_in_multiscale(depth: np.ndarray, max_depth: float = 3.0,
                       near_bin: float = 1.0, med_bin: float = 2.0,
                       blur_type: str = "bilateral",
                       extrapolate: bool = False) -> np.ndarray:
    """Densify a sparse depth map (meters in, meters out)."""
    d = np.float32(depth).copy()
    valid = d > _VALID_EPS
    near = valid & (d <= near_bin)
    med = (d > near_bin) & (d <= med_bin)
    far = d > med_bin

    inv = np.where(valid, max_depth - d, d)

    dil_far = cv2.dilate(inv * far, _cross_kernel(3))
    dil_med = cv2.dilate(inv * med, _cross_kernel(5))
    dil_near = cv2.dilate(inv * near, _cross_kernel(7))

    out = inv.copy()
    for layer in (dil_far, dil_med, dil_near):     # farthest to nearest
        m = layer > _VALID_EPS
        out[m] = layer[m]

    out = cv2.morphologyEx(out, cv2.MORPH_CLOSE, _full_kernel(5))

    blurred = cv2.medianBlur(out, 5)
    m = out > _VALID_EPS
    out[m] = blurred[m]

    # Fill small holes below the first observed pixel of each column.
    top_mask = _top_valid_mask(out)
    empty = (~(out > _VALID_EPS)) & top_mask
    dilated = cv2.dilate(out, _full_kernel(9))
    out[empty] = dilated[empty]

    # Recompute the top mask (or extrapolate upward).
    if extrapolate:
        vrows = np.argmax(out > _VALID_EPS, axis=0)
        top_vals = out[vrows, np.arange(out.shape[1])]
        rows = np.arange(out.shape[0])[:, None]
        ext = rows < vrows[None, :]
        out = np.where(ext, top_vals[None, :], out)
        top_mask = np.ones_like(out, bool)
    else:
        top_mask = _top_valid_mask(out)

    for _ in range(6):
        empty = (out < _VALID_EPS) & top_mask
        dilated = cv2.dilate(out, _full_kernel(5))
        out[empty] = dilated[empty]

    blurred = cv2.medianBlur(out, 5)
    m = (out > _VALID_EPS) & top_mask
    out[m] = blurred[m]

    if blur_type == "gaussian":
        blurred = cv2.GaussianBlur(out, (5, 5), 0)
        m = (out > _VALID_EPS) & top_mask
        out[m] = blurred[m]
    elif blur_type == "bilateral":
        blurred = cv2.bilateralFilter(out, 5, 0.5, 2.0)
        out[m] = blurred[m]

    m = out > _VALID_EPS
    out[m] = max_depth - out[m]
    return out


def fill_in_fast(depth: np.ndarray, max_depth: float = 3.0,
                 custom_kernel_size: int = 5,
                 blur_type: str = "bilateral",
                 extrapolate: bool = False) -> np.ndarray:
    """Single-scale fast fill (reference: fill_in_fast,
    depth_map_utils_ycb.py:67-132): invert, one dilation, closure, small
    hole fill, optional extrapolation, blur, invert back."""
    d = np.float32(depth).copy()
    valid = d > _VALID_EPS
    d[valid] = max_depth - d[valid]
    d = cv2.dilate(d, _cross_kernel(custom_kernel_size))
    d = cv2.morphologyEx(d, cv2.MORPH_CLOSE, _full_kernel(5))
    empty = d < _VALID_EPS
    dilated = cv2.dilate(d, _full_kernel(7))
    d[empty] = dilated[empty]
    if extrapolate:
        vrows = np.argmax(d > _VALID_EPS, axis=0)
        top_vals = d[vrows, np.arange(d.shape[1])]
        rows = np.arange(d.shape[0])[:, None]
        d = np.where(rows < vrows[None, :], top_vals[None, :], d)
        dilated = cv2.dilate(d, _full_kernel(31))
        empty = d < _VALID_EPS
        d[empty] = dilated[empty]
    d = cv2.medianBlur(d, 5)
    if blur_type == "bilateral":
        d = cv2.bilateralFilter(d, 5, 1.5, 2.0)
    elif blur_type == "gaussian":
        blurred = cv2.GaussianBlur(d, (5, 5), 0)
        m = d > _VALID_EPS
        d[m] = blurred[m]
    m = d > _VALID_EPS
    d[m] = max_depth - d[m]
    return d


def fill_missing(depth: np.ndarray, cam_scale: float = 1.0,
                 scale_to_m: float = 1.0, max_depth: float = 3.0,
                 fill_type: str = "multiscale", impl: str = "auto",
                 **kw) -> np.ndarray:
    """fill_missing semantics (basic_utils.py:436-456): rescale to meters,
    fill ('multiscale' or 'fast'), rescale back.

    ``impl``: "auto" prefers the native C++ pipeline
    (native/preprocess.cpp, ~10x this module per frame — oracle-tested
    against it in tests/test_native_preprocess.py) and falls back here;
    "numpy" forces this module.
    """
    d = depth / cam_scale * scale_to_m
    if fill_type == "fast":
        filled = fill_in_fast(d, max_depth=max_depth, **kw)
    elif fill_type == "multiscale":
        filled = None
        if impl == "auto":
            from pvn3d_tpu.native.preprocess import fill_in_multiscale_native
            filled = fill_in_multiscale_native(d, max_depth=max_depth, **kw)
        if filled is None:
            filled = fill_in_multiscale(d, max_depth=max_depth, **kw)
    else:
        raise ValueError(f"unknown fill_type {fill_type!r}")
    return filled / scale_to_m * cam_scale
