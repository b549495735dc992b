"""Per-stage device-time breakdown of the inference pipeline.

Times each stage of the YCB-config pipeline in isolation with
``device_loop_time`` (T iterations inside one jitted ``lax.scan``,
iteration-dependent inputs, one sync — see utils/profiling.py for why) so
perf work targets the measured hot spot rather than the remembered one.

Stages:
  model_dense   full PVN3D forward, dense CNN tail (bench.py's path)
  model_sparse  full PVN3D forward, sparse CNN tail (param-shared,
                output-equivalent; evaluates the last upsample + heads at
                the 12288 sampled pixels only — models/pspnet.py:103-125)
  cnn_dense / cnn_sparse   the image branch alone
  pointnet2     the point branch alone
  fusion_heads  DenseFusion + the three prediction heads alone
  pose          votes -> cluster -> fit (make_pose_fn) alone

  python -m benchmarks.stage_breakdown [--iters 50] [--batch 1]
        [--stages model_dense model_sparse ...]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from pvn3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from pvn3d_tpu.config import Config
from pvn3d_tpu.data.synthetic import synthetic_batch
from pvn3d_tpu.inference.pipeline import make_pose_fn
from pvn3d_tpu.models.pvn3d import PVN3D, DenseFusion, PredictionHead
from pvn3d_tpu.models.pointnet2 import PointNet2MSG
from pvn3d_tpu.models.pspnet import PSPNetEmbedding
from pvn3d_tpu.utils.assets import stacked_class_radii, stacked_mesh_kps
from pvn3d_tpu.utils.profiling import device_loop_time

ALL_STAGES = ("model_dense", "model_sparse", "cnn_dense", "cnn_sparse",
              "pointnet2", "fusion_heads", "pose", "icp_sampled",
              "icp_fullres")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--batch", type=int, default=1)
    # ICP stages are opt-in (not part of the core pipeline stage-sum;
    # chip_queue runs them as their own section).
    p.add_argument("--stages", nargs="+",
                   default=[s for s in ALL_STAGES
                            if not s.startswith("icp")],
                   choices=ALL_STAGES)
    from pvn3d_tpu.utils.platform import (add_platform_args,
                                           apply_platform)
    add_platform_args(p)
    args = p.parse_args(argv)
    apply_platform(args)

    cfg = Config.ycb()
    mc = cfg.model
    batch = synthetic_batch(cfg, batch_size=args.batch, seed=0)
    pc = jnp.asarray(batch["pointcloud"])
    rgb = jnp.asarray(batch["rgb"])
    choose = jnp.asarray(batch["choose"])
    b, n = choose.shape
    rng = jax.random.PRNGKey(0)
    dtype = jnp.dtype(mc.compute_dtype)

    results = {}

    def time_stage(name, fn):
        ms = device_loop_time(fn, iters=args.iters) * 1e3
        results[name] = round(ms, 3)
        print(f"{name:>14}: {ms:7.3f} ms", flush=True)

    want = set(args.stages)

    if {"model_dense", "model_sparse"} & want:
        dense = PVN3D(cfg=mc, train=False, sparse_cnn=False)
        variables = jax.jit(dense.init)(rng, pc, rgb, choose)
        def model_step(m, i):
            # Salt BOTH array inputs (constant rgb would let XLA hoist
            # the CNN out of the timed scan) and consume every head
            # (summing only seg_logits dead-code-eliminates the kp/ctr
            # heads).
            out = m.apply(variables, pc + i * 1e-6, rgb + i * 1e-6,
                          choose)
            return (jnp.sum(out["seg_logits"]) + jnp.sum(out["kp_offsets"])
                    + jnp.sum(out["ctr_offsets"]))

        if "model_dense" in want:
            time_stage("model_dense", lambda i: model_step(dense, i))
        if "model_sparse" in want:
            sparse = PVN3D(cfg=mc, train=False, sparse_cnn=True)
            time_stage("model_sparse", lambda i: model_step(sparse, i))

    if {"cnn_dense", "cnn_sparse"} & want:
        cnn = PSPNetEmbedding(
            n_classes=mc.n_classes, sizes=mc.cnn.psp_sizes,
            psp_out=mc.cnn.psp_out, up_channels=mc.cnn.up_channels,
            embedding_dim=mc.cnn.embedding_dim,
            dropout_psp=mc.cnn.dropout_psp, dropout_up=mc.cnn.dropout_up,
            backbone_layers=mc.cnn.backbone_layers, train=False, dtype=dtype)
        cvars = jax.jit(cnn.init)(rng, rgb)
        if "cnn_dense" in want:
            time_stage("cnn_dense", lambda i: jnp.sum(
                cnn.apply(cvars, rgb + i * 1e-6)[0]))
        if "cnn_sparse" in want:
            time_stage("cnn_sparse", lambda i: jnp.sum(
                cnn.apply(cvars, rgb + i * 1e-6, choose=choose)[0]))

    if "pointnet2" in want:
        pn2 = PointNet2MSG(cfg=mc.pointnet2, train=False, dtype=dtype)
        pvars = jax.jit(pn2.init)(rng, pc)
        time_stage("pointnet2", lambda i: jnp.sum(
            pn2.apply(pvars, pc + i * 1e-6)))

    if "fusion_heads" in want:
        rgb_emb = jax.random.normal(rng, (b, n, mc.cnn.embedding_dim))
        cld_emb = jax.random.normal(rng, (b, n, mc.pointnet2.fp_mlps[0][-1]))

        import flax.linen as nn

        class _FH(nn.Module):
            @nn.compact
            def __call__(self, r, c):
                fused = DenseFusion(train=False, dtype=dtype)(r, c)
                seg = PredictionHead(mc.seg_head, mc.n_classes, train=False,
                                     dtype=dtype)(fused)
                kp = PredictionHead(mc.kp_head, mc.n_keypoints * 3,
                                    train=False, dtype=dtype)(fused)
                ctr = PredictionHead(mc.ctr_head, 3, train=False,
                                     dtype=dtype)(fused)
                return jnp.sum(seg) + jnp.sum(kp) + jnp.sum(ctr)

        fh = _FH()
        fvars = jax.jit(fh.init)(rng, rgb_emb, cld_emb)
        time_stage("fusion_heads", lambda i: fh.apply(
            fvars, rgb_emb + i * 1e-6, cld_emb))

    if "pose" in want:
        pose_fn = make_pose_fn(cfg, stacked_mesh_kps("ycb", mc.n_classes),
                               stacked_class_radii("ycb", mc.n_classes))
        k1, k2, k3 = jax.random.split(rng, 3)
        seg = jax.random.randint(k1, (b, n), 0, mc.n_classes, jnp.int32)
        ctr_of = jax.random.normal(k2, (b, 1, n, 3)) * 0.01
        kp_of = jax.random.normal(k3, (b, mc.n_keypoints, n, 3)) * 0.01
        pcld = pc[..., :3]
        time_stage("pose", lambda i: jnp.sum(pose_fn(
            pcld + i * 1e-6, seg, ctr_of, kp_of).poses))

    if {"icp_sampled", "icp_fullres"} & want:
        import numpy as np

        from pvn3d_tpu.inference.pipeline import make_icp_step

        rs = np.random.RandomState(0)
        n_mesh = cfg.icp.max_mesh_points
        mesh_icp = (rs.randn(mc.n_classes, n_mesh, 3) * 0.03
                    ).astype(np.float32)
        valid_icp = np.ones((mc.n_classes, n_mesh), bool)
        valid_icp[0] = False
        icp_step = make_icp_step(cfg, mesh_icp, valid_icp)
        # Realistic-convergence geometry (the ICP while_loop early-exits,
        # so timing is data-dependent): the scene IS each class's mesh
        # under a known pose, class centers spread on a grid in front of
        # the camera, init poses 1 cm off — ICP converges in a
        # production-like handful of iterations instead of pinning at
        # max_iter=500 on unfittable random clouds.
        npts = pc.shape[1]
        offs = np.stack([(np.arange(mc.n_classes) % 5 - 2) * 0.12,
                         (np.arange(mc.n_classes) // 5 - 2) * 0.08,
                         np.full(mc.n_classes, 1.0)], -1).astype(np.float32)
        # 6 populated classes (a realistic YCB scene): ~2048 points each
        # clears the >= min_class_points gate, so the timed program
        # reflects production convergence — note the un-gated classes
        # still run icp_refine (fixed-shape XLA), the gate only selects
        # which pose is returned.
        seg_icp = rs.randint(1, 7, (b, npts)).astype(np.int32)
        rows = rs.randint(0, n_mesh, (b, npts))
        scene = (mesh_icp[seg_icp, rows] + offs[seg_icp]
                 + rs.randn(b, npts, 3).astype(np.float32) * 0.001)
        poses0 = np.tile(np.eye(3, 4, dtype=np.float32),
                         (b, mc.n_classes, 1, 1))
        poses0[..., :, 3] = offs[None] + 0.01
        scene_j = jnp.asarray(scene.astype(np.float32))
        seg_j = jnp.asarray(seg_icp)
        poses_j = jnp.asarray(poses0)
        if "icp_sampled" in want:
            time_stage("icp_sampled", lambda i: jnp.sum(
                icp_step(scene_j + i * 1e-6, seg_j, poses_j)))
        if "icp_fullres" in want:
            # Splat the scene into a real depth map through the YCB K1
            # intrinsics; the full-res path then unprojects it, 1-NN
            # label-fills from the sampled cloud and re-extracts class
            # clouds (inference/icp.py::fullres_class_clouds).
            K = np.array([[1066.8, 0, 313.0], [0, 1067.5, 241.3],
                          [0, 0, 1]], np.float32)
            h_img, w_img = mc.image_height, mc.image_width
            depth = np.zeros((b, h_img, w_img), np.float32)
            for bi in range(b):
                u = np.clip((K[0, 0] * scene[bi, :, 0] / scene[bi, :, 2]
                             + K[0, 2]).astype(int), 0, w_img - 1)
                v = np.clip((K[1, 1] * scene[bi, :, 1] / scene[bi, :, 2]
                             + K[1, 2]).astype(int), 0, h_img - 1)
                depth[bi, v, u] = scene[bi, :, 2]
            depth_j = jnp.asarray(depth)
            camk_j = jnp.asarray(np.tile(K, (b, 1, 1)))
            time_stage("icp_fullres", lambda i: jnp.sum(
                icp_step(scene_j + i * 1e-6, seg_j, poses_j,
                         depth_j, camk_j)))

    print(json.dumps({"stage_ms": results, "iters": args.iters,
                      "batch": args.batch}))


if __name__ == "__main__":
    main()
