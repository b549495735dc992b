"""Evaluation entry point: ADD / ADD-S / AUC over a test set.

Usage (mirrors `train_*_pvn3d -eval_net --test` and `eval_icp`):

  python -m pvn3d_tpu.apps.evaluate --dataset ycb --data_root /path/ycb \
      --checkpoint_dir runs/ycb [--icp]
  python -m pvn3d_tpu.apps.evaluate --dataset linemod --cls ape \
      --data_root /path/Linemod_preprocessed --checkpoint_dir runs/ape
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=("ycb", "linemod"), default="ycb")
    p.add_argument("--cls", default="ape")
    p.add_argument("--data_root", required=True)
    p.add_argument("--checkpoint_dir", default="",
                   help="orbax run dir (or use --torch_ckpt)")
    p.add_argument("--torch_ckpt", default="",
                   help="evaluate a reference torch checkpoint "
                        "(.pth.tar) converted on the fly — BASELINE "
                        "config 1 path")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--icp", action="store_true",
                   help="refine poses with batched ICP (eval_icp parity)")
    p.add_argument("--occ", action="store_true",
                   help="evaluate the Occlusion-LineMOD split: --data_root "
                        "is an OCCLUSION_LINEMOD checkout (reference "
                        "-test_occ, train_linemod_pvn3d.py:97-99 — whose "
                        "OCC_LM_Dataset is undefined upstream)")
    p.add_argument("--lm_root", default="",
                   help="with --occ: Linemod_preprocessed checkout for "
                        "object meshes (defaults to --data_root)")
    p.add_argument("--no_fill_depth", action="store_true")
    p.add_argument("--device_preprocess", action="store_true",
                   help="run depth completion / normals / point sampling "
                        "on the chip inside the jitted pipeline (host "
                        "workers only decode images) — removes the "
                        "~70 ms/frame host loader bottleneck")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sparse_cnn", action="store_true",
                   help="force the sparse CNN tail (now the eval default; "
                        "flag kept for A/B symmetry)")
    p.add_argument("--dense_cnn", action="store_true",
                   help="force the dense CNN tail + gather (A/B arm; "
                        "sparse is the eval default, models/pspnet.py)")
    p.add_argument("--platform", default="",
                   help="force a jax backend (e.g. 'cpu') — the env var "
                        "alone cannot override this image's pre-registered "
                        "remote TPU backend")
    p.add_argument("--packed_dir", default="",
                   help="evaluate from npz shards (tools/preprocess_testset)"
                        " instead of raw frames — also the Occlusion-LineMOD"
                        " path (pack the occ split first)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.platform:
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)
    if not args.torch_ckpt and not args.checkpoint_dir:
        raise SystemExit("need --checkpoint_dir or --torch_ckpt")
    if args.occ and args.dataset != "linemod":
        raise SystemExit("--occ requires --dataset linemod")
    from pvn3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from pvn3d_tpu import config as C
    from pvn3d_tpu.apps.train import make_dataset_factory
    from pvn3d_tpu.config import Config
    from pvn3d_tpu.data.loader import DataLoader
    from pvn3d_tpu.data.synthetic import synthetic_batch
    from pvn3d_tpu.inference.evaluator import PoseEvaluator
    from pvn3d_tpu.inference.pipeline import make_inference_step
    from pvn3d_tpu.train.checkpoint import CheckpointManager
    from pvn3d_tpu.train.state import create_train_state
    from pvn3d_tpu.utils.assets import (stacked_class_radii, stacked_mesh_kps,
                                        stacked_mesh_points)

    is_lm = args.dataset == "linemod"
    cfg = Config.linemod(args.cls) if is_lm else Config.ycb()
    n_cls = cfg.model.n_classes
    obj_id = C.LM_OBJ_DICT[args.cls] if is_lm else 0

    example = synthetic_batch(cfg, batch_size=args.batch_size)
    state, model, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), example)
    if args.torch_ckpt:
        from pvn3d_tpu.utils.torch_convert import load_state_from_torch
        state = load_state_from_torch(state, args.torch_ckpt)
        print(f"evaluating reference checkpoint {args.torch_ckpt}",
              flush=True)
    else:
        state = CheckpointManager(args.checkpoint_dir).restore(state) or state
        print(f"evaluating from step {int(state.step)}", flush=True)
    eval_model = model.clone(
        train=False,
        sparse_cnn=(True if args.sparse_cnn
                    else (False if args.dense_cnn else None)))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if is_lm:
        # assets index by object name; row 1 is this object.
        from pvn3d_tpu.utils.assets import get_ctr, get_kps
        kp = get_kps(args.cls, ds_type="linemod")
        ctr = get_ctr(args.cls, ds_type="linemod").reshape(1, 3)
        kps = np.stack([np.zeros_like(np.concatenate([kp, ctr])),
                        np.concatenate([kp, ctr])])
        radii = stacked_class_radii("linemod", 2)
        mesh_root = (args.lm_root or args.data_root) if args.occ \
            else args.data_root
        mesh_pts, mesh_valid = stacked_mesh_points(
            mesh_root, "linemod", n_cls=2, max_points=2000)
    else:
        kps = stacked_mesh_kps("ycb", n_cls)
        radii = stacked_class_radii("ycb", n_cls)
        mesh_pts, mesh_valid = stacked_mesh_points(
            args.data_root, "ycb", n_cls)

    if args.device_preprocess:
        from pvn3d_tpu.inference.pipeline import make_raw_inference_step
        raw_step = make_raw_inference_step(
            cfg, eval_model, variables, kps, radii, mesh_pts, mesh_valid,
            fill_depth=not is_lm and not args.no_fill_depth)
        key = jax.random.PRNGKey(args.seed)

        def step(batch):
            nonlocal key
            key, sub = jax.random.split(key)
            return raw_step(
                {k: jnp.asarray(v) for k, v in batch.items()}, sub)
    else:
        step = make_inference_step(cfg, eval_model, variables, kps, radii,
                                   mesh_pts, mesh_valid)
    refine_fn = None
    if args.icp:
        from pvn3d_tpu.inference.pipeline import make_icp_refine_fn
        refine_fn = make_icp_refine_fn(cfg, mesh_pts, mesh_valid)
        if args.packed_dir:
            print("WARNING: --icp with --packed_dir: packed shards carry "
                  "no full-res depth; the ICP scene will be the sampled "
                  "cloud, not the eval_icp.py full-resolution scene",
                  flush=True)
    if args.packed_dir:
        from pvn3d_tpu.tools.preprocess_testset import iter_packed_batches
        loader = iter_packed_batches(args.packed_dir, args.batch_size)
    else:
        loader = DataLoader(make_dataset_factory(args, "test"),
                            args.batch_size, num_workers=args.workers)

    ev = PoseEvaluator(n_cls=max(n_cls, obj_id + 1),
                       ds_type=args.dataset)

    from pvn3d_tpu.inference.pipeline import accumulate_batches
    n_frames = accumulate_batches(
        step, loader, ev, ds_type=args.dataset, obj_id=obj_id,
        refine_fn=refine_fn, max_frames=args.max_frames)
    print(f"evaluated {n_frames} frames")
    if is_lm:
        summary = ev.summarize_linemod(obj_id, verbose=True)
    else:
        summary = ev.summarize(verbose=True)
    return summary


if __name__ == "__main__":
    main()
