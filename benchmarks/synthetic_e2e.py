"""No-data end-to-end proof: train from scratch on the procedural world,
then recover poses with the full pipeline and report ADD/ADD-S AUC.

  python -m benchmarks.synthetic_e2e [--steps 600] [--batch 4] [--tiny]

Passing means every stage works together: frame construction, model,
losses, optimizer, BN stats, seg argmax, vote clustering, mask refinement,
Umeyama fit, ADD metrics.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--eval_frames", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--n_points", type=int, default=0)
    p.add_argument("--fps_groups", type=int, default=1,
                   help="sharded-FPS group count (accuracy validation of "
                        "the fast mode: train AND eval run with it)")
    p.add_argument("--eval_fps_groups", type=int, default=0,
                   help="override fps_groups for the EVAL pipeline only "
                        "(deployment scenario: weights trained exact, "
                        "inference sharded)")
    p.add_argument("--query_mode", default="",
                   help="override PointNet2Config.query_mode for train AND "
                        "eval ('pallas' validates the fused residue-class "
                        "kernel's neighbor composition end-to-end)")
    p.add_argument("--eval_query_mode", default="",
                   help="override query_mode for the EVAL pipeline only "
                        "(deployment scenario: weights trained with approx, "
                        "inference on the pallas kernel)")
    p.add_argument("--query_compute", default="",
                   help="override PointNet2Config.query_compute for EVAL "
                        "('bf16' validates the halved-cost distance "
                        "matrices end-to-end)")
    p.add_argument("--query_recall", type=float, default=0.0,
                   help="override PointNet2Config.query_recall for EVAL "
                        "(approx_min_k recall_target; 0 = config default)")
    p.add_argument("--cluster_cap", type=int, default=0,
                   help="override ClusterConfig.max_points_per_class for "
                        "eval (0 = config default 512; use e.g. 12288 for "
                        "the all-points reference behavior)")
    p.add_argument("--icp", action="store_true",
                   help="also report AUC with ICP refinement (sampled "
                        "scene mode — the synthetic world has no full-res "
                        "depth map; matches the reporting shape of the "
                        "reference's eval_icp.py:325-357 with/without "
                        "table)")
    p.add_argument("--seed", type=int, default=0,
                   help="world + init + data-stream seed (replicate runs "
                        "for variance estimates; the metric's run-to-run "
                        "spread is several ADD-AUC points)")
    p.add_argument("--save_ckpt", default="",
                   help="save trained params to this .npz for reuse")
    p.add_argument("--load_ckpt", default="",
                   help="skip training; load params from --save_ckpt output")
    from pvn3d_tpu.utils.platform import (add_platform_args,
                                           apply_platform)
    add_platform_args(p)
    args = p.parse_args(argv)
    apply_platform(args)

    from pvn3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from pvn3d_tpu.config import Config, TrainConfig
    from pvn3d_tpu.data.synthetic_world import SyntheticWorld
    from pvn3d_tpu.inference.evaluator import PoseEvaluator, eval_frame_metrics
    from pvn3d_tpu.inference.pipeline import make_pose_fn
    from pvn3d_tpu.models.pvn3d import PVN3D
    from pvn3d_tpu.train.state import create_train_state
    from pvn3d_tpu.train.step import make_train_step

    if args.tiny:
        import __graft_entry__ as graft
        cfg = graft._tiny_config()
        h = w = 64
    else:
        cfg = Config.ycb()
        h, w = cfg.model.image_height, cfg.model.image_width
    n_points = args.n_points or cfg.model.n_sample_points
    cfg = dataclasses.replace(
        cfg, train=TrainConfig(base_lr=args.lr, max_lr=args.lr))
    train_pn_over = {}
    if args.fps_groups > 1:
        train_pn_over["fps_groups"] = args.fps_groups
    if args.query_mode:
        train_pn_over["query_mode"] = args.query_mode
    if train_pn_over:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, pointnet2=dataclasses.replace(
                cfg.model.pointnet2, **train_pn_over)))

    world = SyntheticWorld(n_classes=4,
                           n_keypoints=cfg.model.n_keypoints, seed=0)
    rng_np = np.random.RandomState(args.seed)
    kw = dict(n_points=n_points, height=h, width=w)
    batch0 = world.sample_batch(rng_np, args.batch, **kw)

    state, model, tx = create_train_state(
        cfg, jax.random.PRNGKey(args.seed), batch0)
    if args.load_ckpt:
        import pickle
        with open(args.load_ckpt, "rb") as f:
            tree = pickle.load(f)
        state = state.replace(params=tree["params"],
                              batch_stats=tree["batch_stats"])
        # keep the data stream identical to a trained run: skip the same
        # number of training batches before eval.
        for _ in range(args.steps):
            world.sample_batch(rng_np, args.batch, **kw)
        print(f"loaded {args.load_ckpt}", flush=True)
    else:
        step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
        rng = jax.random.PRNGKey(1)

        t0 = time.perf_counter()
        metrics = {}
        for it in range(args.steps):
            batch = world.sample_batch(rng_np, args.batch, **kw)
            state, metrics = step(state, batch, rng)
            if it % 100 == 0 or it == args.steps - 1:
                print(f"it={it} loss={float(metrics['loss']):.3f} "
                      f"acc={float(metrics['acc_rgbd']):.3f} "
                      f"kp={float(metrics['loss_kp']):.3f}", flush=True)
        print(f"trained {args.steps} steps in {time.perf_counter()-t0:.1f}s",
              flush=True)
    if args.save_ckpt:
        import pickle
        tree = {"params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats)}
        with open(args.save_ckpt, "wb") as f:
            pickle.dump(tree, f)
        print(f"saved {args.save_ckpt}", flush=True)

    # Inference + metrics with the trained weights.
    if args.cluster_cap:
        cfg = dataclasses.replace(cfg, cluster=dataclasses.replace(
            cfg.cluster, max_points_per_class=args.cluster_cap))
    pn_over = {}
    if args.eval_fps_groups:
        pn_over["fps_groups"] = args.eval_fps_groups
    if args.eval_query_mode:
        pn_over["query_mode"] = args.eval_query_mode
    if args.query_compute:
        pn_over["query_compute"] = args.query_compute
    if args.query_recall:
        pn_over["query_recall"] = args.query_recall
    if pn_over:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, pointnet2=dataclasses.replace(
                cfg.model.pointnet2, **pn_over)))
        model = PVN3D(cfg=cfg.model, train=False)
    eval_model = model.clone(train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # Pad world class tables up to the model's class count (extra classes
    # simply never occur in frames).
    n_cls = cfg.model.n_classes
    def pad_c(a):
        out = np.zeros((n_cls,) + a.shape[1:], a.dtype)
        out[:len(a)] = a
        return out
    radii = np.full(n_cls, 0.1, np.float32)
    pose_fn = make_pose_fn(cfg, pad_c(world.stacked_kps), radii,
                           refine_mask=True)
    mesh_pts = jnp.asarray(pad_c(world.stacked_pts))
    mesh_valid = jnp.asarray(pad_c(world.stacked_valid))

    metric_fn = jax.vmap(lambda p, c, r: eval_frame_metrics(
        p, c, r, mesh_pts, mesh_valid))

    @jax.jit
    def infer(batch):
        out = eval_model.apply(variables, batch["pointcloud"], batch["rgb"],
                               batch["choose"])
        seg = jnp.argmax(out["seg_logits"], axis=-1).astype(jnp.int32)
        frame = pose_fn(batch["pointcloud"][..., :3], seg,
                        out["ctr_offsets"], out["kp_offsets"])
        add, adds = metric_fn(frame.poses, batch["cls_ids"], batch["rts"])
        return seg, frame.poses, add, adds

    icp_step = None
    if args.icp:
        from pvn3d_tpu.inference.pipeline import make_icp_step
        icp_step = make_icp_step(cfg, pad_c(world.stacked_pts),
                                 pad_c(world.stacked_valid))
        icp_metric = jax.jit(metric_fn)
        ev_icp = PoseEvaluator(n_cls=n_cls, sym_cls_ids=(), ds_type="syn")

    ev = PoseEvaluator(n_cls=n_cls, sym_cls_ids=(), ds_type="syn")
    seg_accs = []
    for _ in range(max(args.eval_frames // args.batch, 1)):
        batch = world.sample_batch(rng_np, args.batch, **kw)
        seg, poses, add, adds = infer(batch)
        seg_accs.append(float(np.mean(
            np.asarray(seg) == batch["labels"])))
        for b in range(args.batch):
            ev.add_frame(batch["cls_ids"][b], np.asarray(add)[b],
                         np.asarray(adds)[b])
        if icp_step is not None:
            refined = icp_step(
                jnp.asarray(batch["pointcloud"][..., :3]), seg, poses)
            add_i, adds_i = icp_metric(refined,
                                       jnp.asarray(batch["cls_ids"]),
                                       jnp.asarray(batch["rts"]))
            for b in range(args.batch):
                ev_icp.add_frame(batch["cls_ids"][b],
                                 np.asarray(add_i)[b],
                                 np.asarray(adds_i)[b])
    s = ev.summarize()
    result = {
        "metric": "synthetic_e2e_add_s_auc",
        "value": round(s["all_add_s_auc"], 2),
        "add_auc": round(s["all_add_auc"], 2),
        "adds_auc": round(s["all_adds_auc"], 2),
        "eval_seg_acc": round(float(np.mean(seg_accs)), 4),
        "steps": args.steps,
    }
    if icp_step is not None:
        # Reference reporting shape: AUC with vs without refinement
        # (eval_icp.py:325-357 prints add/adds per class +/- ICP).
        si = ev_icp.summarize()
        result["icp"] = {
            "add_s_auc": round(si["all_add_s_auc"], 2),
            "add_auc": round(si["all_add_auc"], 2),
            "adds_auc": round(si["all_adds_auc"], 2),
            "delta_add_auc": round(si["all_add_auc"] - s["all_add_auc"], 2),
            "delta_adds_auc": round(
                si["all_adds_auc"] - s["all_adds_auc"], 2),
            "scene_mode": "sampled",
        }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
