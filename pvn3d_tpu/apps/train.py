"""Training entry point.

Usage (mirrors the reference CLIs, pvn3d/train/train_{ycb,linemod}_pvn3d.py):

  python -m pvn3d_tpu.apps.train --dataset ycb --data_root /path/ycb \
      --checkpoint_dir runs/ycb
  python -m pvn3d_tpu.apps.train --dataset linemod --cls ape \
      --data_root /path/Linemod_preprocessed --checkpoint_dir runs/ape

Single-process multi-chip by default (dp over all local devices); multi-host
via --distributed (jax.distributed.initialize + per-host data sharding).
"""
from __future__ import annotations

import argparse
import functools

import jax


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=("ycb", "linemod"), default="ycb")
    p.add_argument("--cls", default="ape",
                   help="LineMOD object (reference: -cls)")
    p.add_argument("--data_root", required=True)
    p.add_argument("--checkpoint_dir", default="runs/default")
    p.add_argument("--batch_size", type=int, default=0,
                   help="global batch (0 = config default 24)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--max_steps", type=int, default=0,
                   help="0 = full budget (25 epochs x 4000 iters)")
    p.add_argument("--no_fill_depth", action="store_true")
    p.add_argument("--device_preprocess", action="store_true",
                   help="ship raw decoded frames and run augmentation + "
                        "depth fill + normals + sampling + GT targets "
                        "inside the jitted train step (the host only "
                        "decodes PNGs; see data/device_frame.py)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize forward in backward (large per-chip batch)")
    p.add_argument("--remat_policy", default="", choices=("", "full", "dots"),
                   help="with --remat: 'full' saves nothing, 'dots' keeps "
                        "MXU outputs and recomputes only elementwise glue")
    p.add_argument("--grad_accum", type=int, default=0,
                   help="micro-batches per optimizer step (reference bs-24 "
                        "budget on one chip without remat's recompute tax; "
                        "TrainConfig.grad_accum)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--file_list", default="",
                   help="YCB: override the vendored split list (custom "
                        "subsets / smoke runs)")
    p.add_argument("--val_packed_dir", default="",
                   help="validate from npz shards "
                        "(tools/preprocess_testset) instead of rebuilding "
                        "test frames per eval — the reference trains "
                        "against its preprocessed testset the same way "
                        "(train_ycb_pvn3d.py:419-423)")
    p.add_argument("--platform", default="",
                   help="force a jax backend (e.g. 'cpu') — the env var "
                        "alone cannot override this image's pre-registered "
                        "remote TPU backend")
    p.add_argument("--pretrained_trunk", default="",
                   help="torchvision resnet34 .pth to seed the image trunk "
                        "(reference behavior: extractors.py:215-224)")
    p.add_argument("--torch_ckpt", default="",
                   help="full reference PVN3D .pth.tar to start from "
                        "(converted via utils.torch_convert)")
    # Hyperparameter overrides (reference argparse, train_ycb_pvn3d.py:39-92;
    # 0/negative = keep the config default).
    p.add_argument("--base_lr", type=float, default=0.0)
    p.add_argument("--max_lr", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=-1.0)
    p.add_argument("--bn_momentum", type=float, default=0.0)
    p.add_argument("--bn_decay", type=float, default=0.0)
    p.add_argument("--decay_step", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=0)
    return p


def make_dataset_factory(args, split: str):
    from pvn3d_tpu.data.frame import FrameSpec
    # --icp (evaluate) needs the full-res depth map in the batch for the
    # reference's full-resolution scene extraction (eval_icp.py:224-291).
    spec = FrameSpec(keep_depth=getattr(args, "icp", False),
                     device_preprocess=getattr(args, "device_preprocess",
                                               False))
    if args.dataset == "ycb":
        from pvn3d_tpu.data.ycb import YCBDataset
        return functools.partial(YCBDataset, args.data_root, split=split,
                                 spec=spec, seed=args.seed,
                                 fill_depth=not args.no_fill_depth,
                                 file_list=getattr(args, "file_list", ""))
    if getattr(args, "occ", False):
        from pvn3d_tpu.data.occlusion_linemod import OcclusionLineMODDataset
        return functools.partial(
            OcclusionLineMODDataset, args.data_root, cls_type=args.cls,
            split=split, spec=spec, seed=args.seed,
            lm_root=getattr(args, "lm_root", "") or None)
    from pvn3d_tpu.data.linemod import LineMODDataset
    return functools.partial(LineMODDataset, args.data_root,
                             cls_type=args.cls, split=split, spec=spec,
                             seed=args.seed)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.platform:
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)
    from pvn3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.distributed:
        jax.distributed.initialize()

    from pvn3d_tpu.config import Config
    from pvn3d_tpu.data.loader import DataLoader
    from pvn3d_tpu.data.synthetic import synthetic_batch
    from pvn3d_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from pvn3d_tpu.train.checkpoint import CheckpointManager
    from pvn3d_tpu.train.state import create_train_state, param_count
    from pvn3d_tpu.train.step import make_eval_step, make_train_step
    from pvn3d_tpu.train.trainer import Trainer

    cfg = (Config.ycb() if args.dataset == "ycb"
           else Config.linemod(args.cls))
    import dataclasses
    overrides = {}
    if args.remat:
        overrides["remat"] = True
    if args.remat_policy:
        overrides["remat_policy"] = args.remat_policy
    if args.grad_accum > 1:
        overrides["grad_accum"] = args.grad_accum
    if args.base_lr > 0:
        overrides["base_lr"] = args.base_lr
    if args.max_lr > 0:
        overrides["max_lr"] = args.max_lr
    if args.weight_decay >= 0:
        overrides["weight_decay"] = args.weight_decay
    if args.bn_momentum > 0:
        overrides["bn_momentum_init"] = args.bn_momentum
    if args.bn_decay > 0:
        overrides["bn_decay"] = args.bn_decay
    if args.decay_step > 0:
        overrides["bn_decay_step"] = args.decay_step
    if args.epochs > 0:
        overrides["n_total_epoch"] = args.epochs
    if overrides:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **overrides))
    batch_size = args.batch_size or cfg.train.mini_batch_size
    max_steps = args.max_steps or (
        cfg.train.n_total_epoch * cfg.train.num_mini_batch_per_epoch)

    mesh = make_mesh(dp=jax.local_device_count(), sp=1)
    example = synthetic_batch(cfg, batch_size=batch_size)
    rng = jax.random.PRNGKey(cfg.train.seed)
    state, model, tx = create_train_state(cfg, rng, example)
    if args.torch_ckpt:
        from pvn3d_tpu.utils.torch_convert import load_state_from_torch
        state = load_state_from_torch(state, args.torch_ckpt)
        print(f"loaded reference checkpoint {args.torch_ckpt}", flush=True)
    elif args.pretrained_trunk:
        from pvn3d_tpu.utils.torch_convert import load_state_from_torch
        state = load_state_from_torch(state, args.pretrained_trunk,
                                      trunk_only=True)
        print(f"seeded image trunk from {args.pretrained_trunk}", flush=True)
    print(f"params: {param_count(state.params)/1e6:.2f}M  "
          f"devices: {jax.device_count()}  batch: {batch_size}", flush=True)
    state = jax.device_put(state, replicated(mesh))

    train_loader = DataLoader(
        make_dataset_factory(args, "train"), batch_size,
        num_workers=args.workers, seed=args.seed, steps=max_steps)
    # Validation always consumes host-built frames (no augmentation, so
    # there is nothing to move on device that the eval raw path doesn't
    # already cover).
    if args.val_packed_dir:
        from pvn3d_tpu.tools.preprocess_testset import iter_packed_batches
        probe = next(iter_packed_batches(args.val_packed_dir, batch_size),
                     None)
        if probe is None or "kp_targ_ofst" not in probe:
            raise SystemExit(
                "--val_packed_dir shards lack the offset targets the val "
                "losses need — pack with preprocess_testset --train_targets")

        class _PackedVal:
            def __iter__(self):
                return iter_packed_batches(args.val_packed_dir, batch_size)

        val_loader = _PackedVal()
    else:
        import copy
        val_args = copy.copy(args)
        val_args.device_preprocess = False
        val_loader = DataLoader(
            make_dataset_factory(val_args, "test"), batch_size,
            num_workers=max(args.workers // 2, 0), seed=args.seed)

    train_step = make_train_step(cfg, model, tx)
    if args.device_preprocess:
        from pvn3d_tpu.data.device_frame import build_train_batch_device

        def train_step_raw(state, raw, rng, _base=train_step):
            b_rng = jax.random.fold_in(jax.random.fold_in(rng, 7919),
                                       state.step)
            batch = build_train_batch_device(
                raw, b_rng, n_sample=cfg.model.n_sample_points,
                n_classes=cfg.model.n_classes,
                # LineMOD never fills depth (linemod_dataset.py get_item)
                fill=args.dataset == "ycb" and not args.no_fill_depth,
                dataset=args.dataset)
            return _base(state, batch, rng)

        train_step = train_step_raw

    trainer = Trainer(
        cfg, state,
        train_step,
        make_eval_step(cfg, model),
        checkpoint_manager=CheckpointManager(args.checkpoint_dir),
        log_every=args.log_every,
        put_batch=lambda b: shard_batch(mesh, b))
    trainer.resume()
    with mesh:
        trainer.fit(iter(train_loader), lambda: iter(val_loader),
                    max_steps=max_steps)


if __name__ == "__main__":
    main()
