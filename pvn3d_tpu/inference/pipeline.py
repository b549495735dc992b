"""End-to-end jitted inference: perceive -> vote -> cluster -> fit -> score.

The reference streams each frame through Python: forward, argmax, a
ThreadPoolExecutor of per-frame `eval_one_frame_pose` calls doing
sequential MeanShift fits and CPU SVDs (pvn3d_eval_utils.py:345-387).
Here the entire batch is one XLA program; per-frame work is vmapped and
per-hypothesis clustering is batched, so a whole eval batch costs one
device dispatch.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.config import Config
from pvn3d_tpu.inference.evaluator import PoseEvaluator, eval_frame_metrics
from pvn3d_tpu.inference.pose import cal_frame_poses


def make_pose_fn(cfg: Config, mesh_kps: np.ndarray, radii: np.ndarray,
                 refine_mask: Optional[bool] = None):
    """Batched (vmapped) votes -> poses closure.

    mesh_kps: (n_cls, n_kps+1, 3); radii: (n_cls,).
    """
    n_cls = cfg.model.n_classes
    if refine_mask is None:
        refine_mask = cfg.dataset.name == "ycb"
    mesh_kps_j = jnp.asarray(mesh_kps, jnp.float32)
    radii_j = jnp.asarray(radii, jnp.float32)
    cl = cfg.cluster

    # Hypotheses per (K, K) distance tile in the chunked XLA winner pass:
    # 16 at the default K=512, shrinking so one tile stays ~<= 64 MB f32 —
    # large caps (the --cluster_cap 12288 all-points reference arm) would
    # otherwise materialize chunk*K^2 floats at once (16 x 12288^2 ~ 9.7 GB,
    # the round-4 "cap 12288 OOMs HBM" finding was this, not the cap itself).
    k_cap = cl.max_points_per_class
    chunk = max(1, min(16, (4096 * 4096 * 1) // max(k_cap * k_cap, 1)))

    def one_frame(pcld, mask, ctr_of, kp_of):
        return cal_frame_poses(
            pcld, mask, ctr_of, kp_of, mesh_kps_j, radii_j,
            n_cls=n_cls, n_kps=cfg.model.n_keypoints,
            k=k_cap, bandwidth=cl.bandwidth,
            max_iter=cl.max_iter, use_ctr=cl.use_ctr,
            use_ctr_clus_filter=cl.use_ctr_clus_filter,
            refine_mask=refine_mask, chunk=chunk)

    return jax.vmap(one_frame)


def make_inference_step(cfg: Config, model, variables,
                        mesh_kps: np.ndarray, radii: np.ndarray,
                        mesh_pts: Optional[np.ndarray] = None,
                        mesh_valid: Optional[np.ndarray] = None,
                        refine_mask: Optional[bool] = None):
    """Full jitted step: batch dict -> (poses, present, metrics).

    With mesh_pts/mesh_valid given, also returns per-instance ADD/ADD-S
    against the GT slots in the batch (cls_ids, rts).
    """
    pose_fn = make_pose_fn(cfg, mesh_kps, radii, refine_mask=refine_mask)
    has_metrics = mesh_pts is not None
    if has_metrics:
        mesh_pts_j = jnp.asarray(mesh_pts, jnp.float32)
        mesh_valid_j = jnp.asarray(mesh_valid)

    @jax.jit
    def step(batch: Dict[str, jnp.ndarray]):
        outputs = model.apply(variables, batch["pointcloud"], batch["rgb"],
                              batch["choose"])
        seg = jnp.argmax(outputs["seg_logits"], axis=-1).astype(jnp.int32)
        pcld = batch["pointcloud"][..., :3]
        frame = pose_fn(pcld, seg, outputs["ctr_offsets"],
                        outputs["kp_offsets"])
        result = {"poses": frame.poses, "present": frame.present,
                  "kps": frame.kps, "seg": seg}
        if has_metrics and "cls_ids" in batch:
            add, adds = jax.vmap(
                lambda p, c, r: eval_frame_metrics(
                    p, c, r, mesh_pts_j, mesh_valid_j)
            )(frame.poses, batch["cls_ids"], batch["rts"])
            result["add"] = add
            result["adds"] = adds
        return result

    return step


def make_raw_inference_step(cfg: Config, model, variables,
                            mesh_kps: np.ndarray, radii: np.ndarray,
                            mesh_pts: Optional[np.ndarray] = None,
                            mesh_valid: Optional[np.ndarray] = None,
                            fill_depth: bool = True,
                            cam_scale: float = 1.0,
                            refine_mask: Optional[bool] = None):
    """Sensor-to-pose jitted step: batch dict with rgb (B,H,W,3) 0-255,
    depth (B,H,W) native units, cam_k (B,3,3) -> poses (+ metrics when
    GT cls_ids/rts slots and mesh points are given).

    The entire reference host pipeline — ip_basic depth completion,
    normal estimation, point sampling, feature assembly
    (ycb_dataset.py:206-306 + 60 worker processes) — runs inside the same
    XLA program as perceive->vote->cluster->fit, via the on-device frame
    builder (data/device_frame.py).  The host only decodes images.
    """
    from pvn3d_tpu.data.device_frame import build_inference_batch_device

    pose_fn = make_pose_fn(cfg, mesh_kps, radii, refine_mask=refine_mask)
    n_sample = cfg.model.n_sample_points
    has_metrics = mesh_pts is not None
    if has_metrics:
        mesh_pts_j = jnp.asarray(mesh_pts, jnp.float32)
        mesh_valid_j = jnp.asarray(mesh_valid)

    @jax.jit
    def step(batch: Dict[str, jnp.ndarray], key):
        rgb = batch["rgb"]
        built = build_inference_batch_device(
            rgb, batch["depth"], batch["cam_k"], key, n_sample=n_sample,
            cam_scale=cam_scale, fill=fill_depth)
        outputs = model.apply(variables, built["pointcloud"], rgb,
                              built["choose"])
        seg = jnp.argmax(outputs["seg_logits"], axis=-1).astype(jnp.int32)
        pcld = built["pointcloud"][..., :3]
        frame = pose_fn(pcld, seg, outputs["ctr_offsets"],
                        outputs["kp_offsets"])
        result = {"poses": frame.poses, "present": frame.present,
                  "seg": seg, "choose": built["choose"],
                  "pointcloud": built["pointcloud"],
                  "depth_m": built["depth_m"]}
        if has_metrics and "cls_ids" in batch:
            add, adds = jax.vmap(
                lambda p, c, r: eval_frame_metrics(
                    p, c, r, mesh_pts_j, mesh_valid_j)
            )(frame.poses, batch["cls_ids"], batch["rts"])
            result["add"] = add
            result["adds"] = adds
        return result

    return step


def make_icp_step(cfg: Config, mesh_pts: np.ndarray, mesh_valid: np.ndarray):
    """Batched ICP refinement of per-class poses against the predicted-class
    scene points (reference: eval_icp.py).

    Returns a jitted fn:
      (pcld (B,N,3), seg (B,N), poses (B,n_cls,3,4))          [sampled mode]
      or additionally (depth (B,H,W), cam_k (B,3,3))          [full-res mode]
    -> refined poses (B, n_cls, 3, 4).

    Full-res mode is reference parity: the scene is the full-resolution
    depth cloud of the 1-NN-upsampled predicted mask, capped at
    icp.max_scene_points per class, with the >= min_class_points gate on
    the full-res count (eval_icp.py:224-291, :388-426, :146-151).  The
    sampled mode (no depth map available, e.g. packed shards) falls back to
    class points of the 12288-pt sampled cloud.
    """
    from pvn3d_tpu.inference.icp import (fullres_class_clouds,
                                         refine_frame_poses)
    from pvn3d_tpu.inference.pose import _select_class_points

    icp_cfg = cfg.icp
    n_cls = mesh_pts.shape[0]
    k = icp_cfg.max_scene_points
    mesh_pts_j = jnp.asarray(mesh_pts[1:], jnp.float32)
    mesh_valid_j = jnp.asarray(mesh_valid[1:])

    def refine(ps, scene, valid, counts):
        refined, _, _ = refine_frame_poses(
            ps[1:], mesh_pts_j, mesh_valid_j, scene, valid,
            min_points=icp_cfg.min_class_points,
            cluster_bandwidth=icp_cfg.cluster_bandwidth,
            max_iter=icp_cfg.max_iter, tolerance=icp_cfg.tolerance,
            gate_counts=counts)
        return jnp.concatenate([ps[:1], refined], axis=0)

    @jax.jit
    def step(pcld, seg, poses, depth=None, cam_k=None):
        if depth is not None:
            def one_frame(pc, sg, ps, dp, ck):
                scene, valid, counts = fullres_class_clouds(
                    dp, ck, pc, sg, n_cls, k)
                return refine(ps, scene, valid, counts)
            return jax.vmap(one_frame)(pcld, seg, poses, depth, cam_k)

        def one_frame(pc, sg, ps):
            sel, valid, _ = _select_class_points(sg, n_cls, k)
            return refine(ps, pc[sel], valid, None)
        return jax.vmap(one_frame)(pcld, seg, poses)

    return step


def make_icp_refine_fn(cfg: Config, mesh_pts: np.ndarray,
                       mesh_valid: np.ndarray, warn=None):
    """ICP post-refinement closure for ``accumulate_batches``:
    ``refine_fn(batch, out) -> (add, adds)`` recomputed from the refined
    poses.

    Scene selection per reference priority (eval_icp.py:224-291): the
    on-chip filled depth when the device-preprocess step produced one,
    else the batch's raw full-res depth (``--icp`` sets
    ``FrameSpec.keep_depth``), else — LOUDLY — the sampled 12288-pt
    cloud, which is NOT reference parity (packed shards carry no depth
    map).  ``warn`` is called once with the fallback message.  The
    closure exposes ``refine_fn.mode`` ("fullres"/"sampled") for
    observability/tests."""
    icp_step = make_icp_step(cfg, mesh_pts, mesh_valid)
    mesh_pts_j = jnp.asarray(mesh_pts)
    mesh_valid_j = jnp.asarray(mesh_valid)
    icp_metrics = jax.jit(jax.vmap(
        lambda p, c, r: eval_frame_metrics(p, c, r, mesh_pts_j,
                                           mesh_valid_j)))
    warn = warn or (lambda msg: print(msg, flush=True))

    def refine_fn(batch, out):
        icp_args = ()
        if "depth_m" in out:    # device-preprocess path: filled on chip
            icp_args = (out["depth_m"], jnp.asarray(batch["cam_k"]))
        elif "depth" in batch:  # full-res reference-parity scene path
            icp_args = (jnp.asarray(batch["depth"]),
                        jnp.asarray(batch["cam_k"]))
        elif refine_fn.mode != "sampled":
            warn("WARNING: batch has no full-res depth map — ICP scene "
                 "falls back to the sampled point cloud (NOT eval_icp.py "
                 "parity; packed shards don't carry depth — evaluate from "
                 "raw frames for the reference-parity scene)")
        refine_fn.mode = "fullres" if icp_args else "sampled"
        pcld = (out["pointcloud"] if "pointcloud" in out
                else jnp.asarray(batch["pointcloud"]))[..., :3]
        refined = icp_step(pcld, out["seg"], out["poses"], *icp_args)
        return icp_metrics(refined, jnp.asarray(batch["cls_ids"]),
                           jnp.asarray(batch["rts"]))

    refine_fn.mode = None
    return refine_fn


def accumulate_batches(step, batches, ev: PoseEvaluator,
                       ds_type: str = "ycb", obj_id: int = 0,
                       refine_fn=None, max_frames: int = 0) -> int:
    """Shared eval accumulation loop (used by ``evaluate_dataset`` and
    ``apps.evaluate``): run ``step`` per batch, optionally post-refine
    the metrics via ``refine_fn(batch, out) -> (add, adds)``, and feed the
    evaluator.  Returns the number of frames scored."""
    n_frames = 0
    for batch in batches:
        batch = dict(batch)
        # Padded final batch (loader pad_last / iter_packed_batches):
        # only the first _n_valid frames are real.
        n_valid = int(batch.pop("_n_valid", 0)) or None
        out = step(batch)
        if "add" not in out:
            continue
        if refine_fn is not None:
            out["add"], out["adds"] = refine_fn(batch, out)
        cls_ids = np.asarray(batch["cls_ids"])
        add = np.asarray(out["add"])
        adds = np.asarray(out["adds"])
        if ds_type == "linemod":
            # Single-object frames store class 1; score under obj_id.
            cls_ids = np.where(cls_ids > 0, obj_id, 0)
        for b in range(n_valid or cls_ids.shape[0]):
            ev.add_frame(cls_ids[b], add[b], adds[b])
        n_frames += n_valid or cls_ids.shape[0]
        if max_frames and n_frames >= max_frames:
            break
    return n_frames


def evaluate_dataset(cfg: Config, model, variables, batches,
                     mesh_kps, radii, mesh_pts, mesh_valid,
                     ds_type: str = "ycb", obj_id: int = 0,
                     verbose: bool = False):
    """Run inference over an iterable of batches and summarize.

    Returns the evaluator summary dict (YCB AUC protocol, or the LineMOD
    0.1-diameter protocol when ds_type == 'linemod').
    """
    step = make_inference_step(cfg, model, variables, mesh_kps, radii,
                               mesh_pts, mesh_valid)
    ev = PoseEvaluator(n_cls=max(cfg.model.n_classes, obj_id + 1),
                       ds_type=ds_type)
    accumulate_batches(step, batches, ev, ds_type=ds_type, obj_id=obj_id)
    if ds_type == "linemod":
        return ev.summarize_linemod(obj_id, verbose=verbose)
    return ev.summarize(verbose=verbose)
