"""Demo: render predicted poses into test images (reference: pvn3d/demo.py).

  python -m pvn3d_tpu.apps.demo --dataset linemod --cls ape \
      --data_root /path/Linemod_preprocessed --checkpoint_dir runs/ape \
      --out_dir pose_vis --n_frames 20
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=("ycb", "linemod"), default="ycb")
    p.add_argument("--cls", default="ape")
    p.add_argument("--data_root", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--out_dir", default="pose_vis")
    p.add_argument("--n_frames", type=int, default=20)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--no_fill_depth", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="",
                   help="force a jax backend (e.g. 'cpu') — the env var "
                        "alone cannot override this image's pre-registered "
                        "remote TPU backend")
    args = p.parse_args(argv)
    if args.platform:
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)

    import cv2

    from pvn3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pvn3d_tpu import config as C
    from pvn3d_tpu.apps.train import make_dataset_factory
    from pvn3d_tpu.config import Config
    from pvn3d_tpu.data.loader import DataLoader
    from pvn3d_tpu.data.synthetic import synthetic_batch
    from pvn3d_tpu.inference.pipeline import make_inference_step
    from pvn3d_tpu.train.checkpoint import CheckpointManager
    from pvn3d_tpu.train.state import create_train_state
    from pvn3d_tpu.utils.assets import (get_ctr, get_kps, load_mesh_points,
                                        stacked_class_radii, stacked_mesh_kps)
    from pvn3d_tpu.utils.viz import draw_pose_mesh

    is_lm = args.dataset == "linemod"
    cfg = Config.linemod(args.cls) if is_lm else Config.ycb()
    n_cls = cfg.model.n_classes

    example = synthetic_batch(cfg, batch_size=1)
    state, model, _ = create_train_state(cfg, jax.random.PRNGKey(0), example)
    state = CheckpointManager(args.checkpoint_dir).restore(state) or state
    eval_model = model.clone(train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if is_lm:
        kp = get_kps(args.cls, ds_type="linemod")
        ctr = get_ctr(args.cls, ds_type="linemod").reshape(1, 3)
        kps = np.stack([np.zeros((len(kp) + 1, 3), np.float32),
                        np.concatenate([kp, ctr])])
        radii = stacked_class_radii("linemod", 2)
        meshes = {1: load_mesh_points(args.data_root,
                                      C.LM_OBJ_DICT[args.cls],
                                      ds_type="linemod")}
        k_mat = C.INTRINSICS["linemod"]
    else:
        kps = stacked_mesh_kps("ycb", n_cls)
        radii = stacked_class_radii("ycb", n_cls)
        meshes = {c: load_mesh_points(args.data_root, c, ds_type="ycb")
                  for c in range(1, n_cls)}
        k_mat = C.INTRINSICS["ycb_K1"]

    step = make_inference_step(cfg, eval_model, variables, kps, radii)
    loader = DataLoader(make_dataset_factory(args, "test"), 1,
                        num_workers=args.workers)
    os.makedirs(args.out_dir, exist_ok=True)

    for i, batch in enumerate(loader):
        if i >= args.n_frames:
            break
        out = step(batch)
        img = np.clip(batch["rgb"][0], 0, 255).astype(np.uint8).copy()
        poses = np.asarray(out["poses"][0])
        present = np.asarray(out["present"][0])
        for cls_id in range(1, poses.shape[0]):
            if not present[cls_id] or cls_id not in meshes:
                continue
            img = draw_pose_mesh(img, meshes[cls_id], poses[cls_id], k_mat,
                                 cls_id)
        path = os.path.join(args.out_dir, f"{i}.jpg")
        cv2.imwrite(path, img[..., ::-1] if not is_lm else img)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
