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


# ---------------------------------------------------------------------------
# Training path: device-side augmentation + target construction
# ---------------------------------------------------------------------------

def build_targets_device(cld: jnp.ndarray, labels: jnp.ndarray,
                         cls_ids: jnp.ndarray, rts: jnp.ndarray,
                         mesh_kps: jnp.ndarray, mesh_ctrs: jnp.ndarray,
                         n_classes: int):
    """jnp twin of data/frame.py::build_targets (exact math).

    cld (P, 3), labels (P,), cls_ids (I,) int32 (0 = empty slot),
    rts (I, 3, 4), mesh_kps (I, K, 3), mesh_ctrs (I, 3).
    Offsets are point - transformed_target at each instance's labeled
    points (ycb_dataset.py:241-278).
    """
    r = rts[:, :, :3]                                    # (I, 3, 3)
    t = rts[:, :, 3]                                     # (I, 3)
    kps_cam = jnp.einsum("ikc,idc->ikd", mesh_kps, r,
                         precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
    ctr_cam = jnp.einsum("ic,idc->id", mesh_ctrs, r,
                         precision=jax.lax.Precision.HIGHEST) + t

    # Label value -> instance row (or -1).  Padded slots (cls 0) only
    # write lut[0], which `labels > 0` below never reads.
    valid = cls_ids > 0
    rows = jnp.arange(cls_ids.shape[0], dtype=jnp.int32)
    lut = jnp.full((n_classes,), -1, jnp.int32)
    lut = lut.at[jnp.clip(cls_ids, 0, n_classes - 1)].set(rows, mode="drop")
    inst = lut[jnp.clip(labels, 0, n_classes - 1)]       # (P,)
    hit = (inst >= 0) & (labels > 0)
    safe = jnp.maximum(inst, 0)

    kp_t = jnp.where(hit[:, None, None],
                     cld[:, None, :] - kps_cam[safe], 0.0)
    ctr_t = jnp.where(hit[:, None], cld - ctr_cam[safe], 0.0)[:, None, :]
    return {
        "cls_ids": cls_ids.astype(jnp.int32), "rts": rts,
        "kp_3ds": jnp.where(valid[:, None, None], kps_cam, 0.0),
        "ctr_3ds": jnp.where(valid[:, None], ctr_cam, 0.0),
        "kp_targ_ofst": kp_t.astype(jnp.float32),
        "ctr_targ_ofst": ctr_t.astype(jnp.float32),
    }


@functools.partial(jax.jit, static_argnames=(
    "n_sample", "n_classes", "cam_scale", "fill", "dataset", "augment",
    "bgr_flip"))
def build_train_frame_device(rgb, depth, label_map, cam_k, cls_ids, rts,
                             mesh_kps, mesh_ctrs, is_syn, back_rgb,
                             back_depth, back_label, key,
                             do_jitter=True,
                             n_sample: int = 12288, n_classes: int = 22,
                             cam_scale: float = 1.0, fill: bool = True,
                             dataset: str = "ycb", augment: bool = True,
                             bgr_flip: bool = False):
    """One TRAIN frame from raw arrays, augmentation included, on device.

    Mirrors the reference train get_item tails (ycb_dataset.py:190-306 +
    augmentation head :109-177; linemod_dataset.py:222-260) with the jnp
    twins: color jitter where ``do_jitter`` (YCB: every train frame;
    LineMOD: real frames only), the synthetic-frame noise stack +
    real-background paste where ``is_syn`` (both traced bools — the
    branches compute and select), the LineMOD BGR flip between jitter and
    noise (``bgr_flip``, linemod_dataset.py:235), depth fill, normals,
    uniform point subsample, GT offset targets.

    rgb/back_rgb: (H, W, 3) 0-255 float or uint8, decoded channel order;
    depth/back_depth in ``cam_scale`` units.  Returns the same sample
    dict as the host build (data/frame.py).
    """
    from pvn3d_tpu.ops.augment_device import (add_real_back_jnp,
                                              color_jitter_jnp,
                                              rgb_add_noise_lm_jnp,
                                              rgb_add_noise_ycb_jnp)
    h, w = depth.shape
    keys = jax.random.split(key, 6)
    noise_fn = (rgb_add_noise_ycb_jnp if dataset == "ycb"
                else rgb_add_noise_lm_jnp)

    if augment:
        rgb = jnp.where(do_jitter, color_jitter_jnp(keys[0], rgb),
                        rgb.astype(jnp.float32))
        if bgr_flip:
            rgb = rgb[..., ::-1]
            back_rgb = back_rgb[..., ::-1]
        syn_rgb = noise_fn(keys[1], rgb)
        syn_rgb, syn_depth = add_real_back_jnp(
            syn_rgb, label_map, depth, back_rgb, back_depth, back_label)
        again = jax.random.uniform(keys[2]) > 0.8
        syn_rgb = jnp.where(again, noise_fn(keys[3], syn_rgb), syn_rgb)
        rgb = jnp.where(is_syn, syn_rgb, rgb)
        depth = jnp.where(is_syn, syn_depth, depth)
    elif bgr_flip:
        rgb = rgb[..., ::-1]

    built = build_inference_frame_device(
        rgb, depth, cam_k, keys[4], n_sample=n_sample,
        cam_scale=cam_scale, fill=fill)
    choose = built["choose"]
    labels = label_map.reshape(h * w)[choose].astype(jnp.int32)
    targets = build_targets_device(
        built["pointcloud"][:, :3], labels, cls_ids, rts, mesh_kps,
        mesh_ctrs, n_classes)
    sample = {
        "pointcloud": built["pointcloud"], "rgb": rgb.astype(jnp.float32),
        "choose": choose, "labels": labels,
    }
    sample.update(targets)
    return sample


def build_train_batch_device(raw: dict, key, n_sample: int, n_classes: int,
                             cam_scale: float = 1.0, fill: bool = True,
                             dataset: str = "ycb", augment: bool = True):
    """Batched raw-train builder: dict of (B, ...) arrays -> train batch.

    ``raw`` carries rgb, depth, label_map, cam_k, cls_ids, rts, mesh_kps,
    mesh_ctrs, is_syn, do_jitter, back_rgb, back_depth, back_label (see
    the datasets' raw-train modes).
    """
    b = raw["rgb"].shape[0]
    keys = jax.random.split(key, b)
    return jax.vmap(
        lambda r, ky: build_train_frame_device(
            r["rgb"], r["depth"], r["label_map"], r["cam_k"], r["cls_ids"],
            r["rts"], r["mesh_kps"], r["mesh_ctrs"], r["is_syn"],
            r["back_rgb"], r["back_depth"], r["back_label"], ky,
            do_jitter=r.get("do_jitter", True),
            n_sample=n_sample, n_classes=n_classes, cam_scale=cam_scale,
            fill=fill, dataset=dataset, augment=augment,
            bgr_flip=dataset == "linemod")
    )({k: raw[k] for k in ("rgb", "depth", "label_map", "cam_k", "cls_ids",
                           "rts", "mesh_kps", "mesh_ctrs", "is_syn",
                           "back_rgb", "back_depth", "back_label",
                           "do_jitter") if k in raw}, keys)
