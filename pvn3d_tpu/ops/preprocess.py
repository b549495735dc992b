"""On-device frame preprocessing: depth completion + normals as XLA ops.

The reference burns 60 host workers per machine feeding its GPUs; the
measured host cost here is ~70 ms/frame of which normals (52 ms) and
ip_basic depth completion (19 ms) dominate (benchmarks/loader_bench.py).
Both are dense stencil pipelines — exactly what the VPU eats for free —
so this module provides jnp twins that run inside the jitted pipeline:

  * ``fill_in_multiscale_jnp``  == data/depth_completion.py::
    fill_in_multiscale (reference ip_basic, depth_map_utils_ycb.py:
    290-445): inverted-depth multi-bin dilation, closure, median blur,
    top-mask hole filling, bilateral smoothing.  Morphology maps to
    separable ``lax.reduce_window`` max/min passes; median/bilateral to
    static 5x5 tap stacks.
  * ``normals_from_depth_map_jnp`` == data/normals.py::
    normals_from_depth_map: box-blurred unprojection, central-difference
    tangents, cross product, camera-facing orientation.

Oracle tests (tests/test_preprocess.py) pin both against the host twins
pixel-for-pixel (modulo float tolerance).  The host versions remain for
CPU-only loaders; `FrameSpec.device_preprocess` selects who does the
work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Validity threshold on (inverted) depths — 0.01 everywhere, matching the
# host twin (data/depth_completion.py:20) and the reference's
# fill_in_multiscale (depth_map_utils_ycb.py:166-264; the 0.1 constants
# there belong to fill_in_fast, a different, unused function).  A larger
# value silently drops real depths in (eps, 0.1] and corrupts pixels
# within eps of max_depth after inversion.
_VALID_EPS = 0.01


def _dilate_full(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Grayscale dilation, size x size full structuring element
    (cv2.dilate with np.ones): separable max filter."""
    pad = size // 2
    y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (size, 1), (1, 1), [(pad, pad), (0, 0)])
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, size), (1, 1), [(0, 0), (pad, pad)])


def _erode_full(x: jnp.ndarray, size: int) -> jnp.ndarray:
    pad = size // 2
    y = jax.lax.reduce_window(x, jnp.inf, jax.lax.min,
                              (size, 1), (1, 1), [(pad, pad), (0, 0)])
    return jax.lax.reduce_window(y, jnp.inf, jax.lax.min,
                                 (1, size), (1, 1), [(0, 0), (pad, pad)])


def _dilate_cross(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Dilation with a cross (plus-shaped) kernel: max of the horizontal
    and vertical 1-D max filters."""
    pad = size // 2
    h = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, size), (1, 1), [(0, 0), (pad, pad)])
    v = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (size, 1), (1, 1), [(pad, pad), (0, 0)])
    return jnp.maximum(h, v)


def _median25_network():
    """Batcher odd-even-merge network over 32 wires, pruned by backward
    reachability to the comparators that can affect output wire 12 (the
    median of 25 real taps + 7 +inf pads) — ~153 of the 191 full-sort
    compare-exchanges.  Same construction as the host twin
    (native/preprocess.cpp::median25_network); selection networks are
    input-independent, so wire 12 carries exactly the sort median."""
    n = 32
    all_ces = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            j = k % p
            while j <= n - 1 - k:
                for i in range(min(k - 1, n - j - k - 1) + 1):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        all_ces.append((i + j, i + j + k))
                j += 2 * k
            k >>= 1
        p <<= 1
    live = [False] * n
    live[12] = True
    kept = []
    for a, b in reversed(all_ces):
        if live[a] or live[b]:
            live[a] = live[b] = True
            kept.append((a, b))
    return kept[::-1]


_MEDIAN25_NET = _median25_network()


def _median5(x: jnp.ndarray) -> jnp.ndarray:
    """5x5 median with cv2.medianBlur's BORDER_REPLICATE semantics.

    Median-selection min/max network over 25 shifted (H, W) planes
    instead of ``jnp.sort`` over a (H, W, 25) stack: every compare-
    exchange is two elementwise VPU ops that XLA fuses, and the lane
    dimension stays the image row — no 25-deep sort, no materialized
    tap axis.  Exact (selection networks compute the true order
    statistic for any input)."""
    h, w = x.shape
    xp = jnp.pad(x, 2, mode="edge")
    wires = [jax.lax.dynamic_slice(xp, (dr, dc), (h, w))
             for dr in range(5) for dc in range(5)]
    wires += [jnp.full_like(x, jnp.inf)] * 7   # pad to 32; sorts above 12
    for a, b in _MEDIAN25_NET:
        lo = jnp.minimum(wires[a], wires[b])
        wires[b] = jnp.maximum(wires[a], wires[b])
        wires[a] = lo
    return wires[12]


def _bilateral5(x: jnp.ndarray, sigma_color: float,
                sigma_space: float) -> jnp.ndarray:
    """cv2.bilateralFilter(d=5, sigmaColor, sigmaSpace) twin.

    cv2 uses a circular d=5 neighborhood (radius 2) with replicated
    borders; weights exp(-dv^2/2sc^2) * exp(-dist^2/2ss^2)."""
    h, w = x.shape
    xp = jnp.pad(x, 2, mode="edge")
    cols = [jax.lax.dynamic_slice(xp, (dr, dc), (h, w))
            for dr in range(5) for dc in range(5)]
    taps = jnp.stack(cols, axis=-1)                         # (H, W, 25)
    offs = [(dr - 2, dc - 2) for dr in range(5) for dc in range(5)]
    d2 = jnp.asarray([r * r + c * c for r, c in offs], jnp.float32)
    in_circle = d2 <= 2.0 * 2.0 + 1e-6   # cv2 masks taps outside radius
    sw = jnp.exp(-0.5 * d2 / (sigma_space * sigma_space))
    sw = jnp.where(in_circle, sw, 0.0)
    dv = taps - x[..., None]
    cw = jnp.exp(-0.5 * (dv * dv) / (sigma_color * sigma_color))
    wsum = jnp.sum(sw * cw, axis=-1)
    return jnp.sum(sw * cw * taps, axis=-1) / jnp.maximum(wsum, 1e-20)


def _top_valid_mask(depth: jnp.ndarray) -> jnp.ndarray:
    valid = depth > _VALID_EPS
    top_row = jnp.argmax(valid, axis=0)
    rows = jnp.arange(depth.shape[0])[:, None]
    return rows >= top_row[None, :]


@functools.partial(jax.jit, static_argnames=("max_depth", "near_bin",
                                             "med_bin", "extrapolate"))
def fill_in_multiscale_jnp(depth: jnp.ndarray, max_depth: float = 3.0,
                           near_bin: float = 1.0, med_bin: float = 2.0,
                           extrapolate: bool = False) -> jnp.ndarray:
    """jnp twin of data/depth_completion.py::fill_in_multiscale
    (bilateral blur_type, the YCB default)."""
    d = depth.astype(jnp.float32)
    valid = d > _VALID_EPS
    near = valid & (d <= near_bin)
    med = (d > near_bin) & (d <= med_bin)
    far = d > med_bin

    inv = jnp.where(valid, max_depth - d, d)

    dil_far = _dilate_cross(inv * far, 3)
    dil_med = _dilate_cross(inv * med, 5)
    dil_near = _dilate_cross(inv * near, 7)

    out = inv
    for layer in (dil_far, dil_med, dil_near):
        m = layer > _VALID_EPS
        out = jnp.where(m, layer, out)

    out = _erode_full(_dilate_full(out, 5), 5)        # MORPH_CLOSE

    blurred = _median5(out)
    out = jnp.where(out > _VALID_EPS, blurred, out)

    top_mask = _top_valid_mask(out)
    empty = (~(out > _VALID_EPS)) & top_mask
    out = jnp.where(empty, _dilate_full(out, 9), out)

    if extrapolate:
        vrows = jnp.argmax(out > _VALID_EPS, axis=0)
        top_vals = out[vrows, jnp.arange(out.shape[1])]
        rows = jnp.arange(out.shape[0])[:, None]
        out = jnp.where(rows < vrows[None, :], top_vals[None, :], out)
        top_mask = jnp.ones_like(out, bool)
    else:
        top_mask = _top_valid_mask(out)

    for _ in range(6):
        empty = (out < _VALID_EPS) & top_mask
        out = jnp.where(empty, _dilate_full(out, 5), out)

    blurred = _median5(out)
    m = (out > _VALID_EPS) & top_mask
    out = jnp.where(m, blurred, out)

    blurred = _bilateral5(out, 0.5, 2.0)
    out = jnp.where(m, blurred, out)

    m = out > _VALID_EPS
    return jnp.where(m, max_depth - out, out)


def fill_missing_jnp(depth: jnp.ndarray, cam_scale: float = 1.0,
                     scale_to_m: float = 1.0,
                     max_depth: float = 3.0) -> jnp.ndarray:
    """fill_missing semantics (basic_utils.py:436-456), multiscale type."""
    d = depth / cam_scale * scale_to_m
    return fill_in_multiscale_jnp(d, max_depth=max_depth) / scale_to_m \
        * cam_scale


def _box_blur_jnp(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Separable mean filter with edge clamping (== data/normals.py::
    _box_blur on a 2-D array)."""
    if r <= 0:
        return x
    size = 2 * r + 1
    xp = jnp.pad(x, ((r, r), (r, r)), mode="edge")
    y = jax.lax.reduce_window(xp, 0.0, jax.lax.add,
                              (size, 1), (1, 1), [(0, 0), (0, 0)])
    y = jax.lax.reduce_window(y, 0.0, jax.lax.add,
                              (1, size), (1, 1), [(0, 0), (0, 0)])
    return y / (size * size)


@functools.partial(jax.jit, static_argnames=("cam_scale", "smooth",
                                             "depth_jump"))
def normals_from_depth_map_jnp(depth: jnp.ndarray, k: jnp.ndarray,
                               cam_scale: float = 1.0, smooth: int = 2,
                               depth_jump: float = 0.05) -> jnp.ndarray:
    """jnp twin of data/normals.py::normals_from_depth_map."""
    h, w = depth.shape[:2]
    z = depth.astype(jnp.float32).reshape(h, w) / cam_scale
    valid = z > 1e-6
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]

    if smooth:
        zs = _box_blur_jnp(jnp.where(valid, z, 0.0), smooth)
        ws = _box_blur_jnp(valid.astype(jnp.float32), smooth)
        z_sm = jnp.where(ws > 1e-6, zs / jnp.maximum(ws, 1e-6), z)
    else:
        z_sm = z
    p = jnp.stack([(cols - k[0, 2]) * z_sm / k[0, 0],
                   (rows - k[1, 2]) * z_sm / k[1, 1], z_sm], axis=-1)

    def diff(a, axis):
        fwd = jnp.roll(a, -1, axis=axis) - a
        bwd = a - jnp.roll(a, 1, axis=axis)
        return (fwd + bwd) * 0.5

    du = diff(p, 1)
    dv = diff(p, 0)
    jump_u = jnp.abs(diff(z[..., None], 1)[..., 0]) > depth_jump
    jump_v = jnp.abs(diff(z[..., None], 0)[..., 0]) > depth_jump
    n = jnp.cross(dv, du)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(norm > 1e-12, n / jnp.maximum(norm, 1e-12), 0.0)
    flip = jnp.sum(n * p, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    bad = (~valid) | jump_u | jump_v
    return jnp.where(bad[..., None], 0.0, n).astype(jnp.float32)
