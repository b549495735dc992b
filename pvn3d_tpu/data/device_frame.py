"""All-device inference frame construction.

The host build (data/frame.py::build_frame) costs ~70 ms/frame of stencil
math (normals + ip_basic fill) — the measured system bottleneck at 4-8
loader workers (benchmarks/loader_bench.py).  This module moves the whole
chain into the jitted pipeline: the host only decodes images; the chip
does depth completion, unprojection, normal estimation, point sampling
and feature assembly.  Semantics mirror the reference get_item tail
(ycb_dataset.py:206-306) via the oracle-tested jnp twins in
ops/preprocess.py.

Deviation from the host path (documented): the random point subsample is
a fixed-key PRNG priority top-k — a uniform random subset without
replacement, like the reference's shuffled-mask trick — but the stream
differs from numpy's, and when fewer than n_sample pixels are valid the
pad repeats the first selected pixel instead of wrap-tiling (inference
frames have ~300k valid pixels, 25x the budget; the reference returns
None below 400 valid anyway).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pvn3d_tpu.geometry.cloud import depth_to_cloud_map
from pvn3d_tpu.ops.preprocess import (fill_missing_jnp,
                                      normals_from_depth_map_jnp)


@functools.partial(jax.jit, static_argnames=("n_sample", "cam_scale",
                                             "fill"))
def build_inference_frame_device(rgb: jnp.ndarray, depth: jnp.ndarray,
                                 cam_k: jnp.ndarray, key: jnp.ndarray,
                                 n_sample: int = 12288,
                                 cam_scale: float = 1.0,
                                 fill: bool = True):
    """One frame: raw sensor arrays -> network inputs, all on device.

    Args:
      rgb: (H, W, 3) float, 0-255, dataset-native channel order.
      depth: (H, W) raw depth in native units (``cam_scale`` per meter).
      cam_k: (3, 3) intrinsics.
      key: PRNG key for the point subsample.
      fill: run ip_basic depth completion first (YCB yes, LineMOD no).

    Returns dict with pointcloud (N, 9) [xyz | rgb | normal], choose (N,)
    flat pixel indices (ascending), and depth_m (H, W) metric filled
    depth (for the full-res ICP scene path).
    """
    h, w = depth.shape
    d = fill_missing_jnp(depth, cam_scale) if fill else depth
    depth_m = d.astype(jnp.float32) / cam_scale
    cloud_map, valid_map = depth_to_cloud_map(depth_m, cam_k, 1.0)
    nrm_map = normals_from_depth_map_jnp(depth_m, cam_k, 1.0)

    p = h * w
    valid = valid_map.reshape(p)
    pri = jax.random.uniform(key, (p,), jnp.float32, 1e-4, 1.0)
    score = jnp.where(valid, pri, -1.0)
    top, sel = jax.lax.top_k(score, n_sample)
    sel = jnp.where(top > 0.0, sel, sel[0])       # under-budget pad
    choose = jnp.sort(sel).astype(jnp.int32)

    cld = cloud_map.reshape(p, 3)[choose]
    nrm = nrm_map.reshape(p, 3)[choose]
    rgb_pt = rgb.reshape(p, 3)[choose].astype(jnp.float32)
    pointcloud = jnp.concatenate([cld, rgb_pt, nrm], axis=1)
    return {"pointcloud": pointcloud, "choose": choose, "depth_m": depth_m}


def build_inference_batch_device(rgb, depth, cam_k, key, n_sample: int,
                                 cam_scale: float = 1.0, fill: bool = True):
    """Batched wrapper: (B, H, W, 3), (B, H, W), (B, 3, 3) -> batch dict."""
    keys = jax.random.split(key, rgb.shape[0])
    return jax.vmap(
        lambda r, d, k, ky: build_inference_frame_device(
            r, d, k, ky, n_sample=n_sample, cam_scale=cam_scale,
            fill=fill))(rgb, depth, cam_k, keys)
