"""Streaming pose service: continuous sensor-to-pose inference.

The deployment-shaped entry point: raw rgb/depth frames stream in, 6-DoF
poses stream out, with the host decode overlapped against the chip via
JAX's async dispatch (frame i+1 is prepared and dispatched before frame
i is awaited).  Unlike bench.py (scan-amortized throughput), this
measures per-frame SERVING latency — including the per-dispatch cost the
scan hides — and reports p50/p90/p99.

The whole frame pipeline runs as one XLA program (depth fill, normals,
sampling, CNN+PointNet++ forward, MeanShift clustering, SVD fit) — the
reference's equivalent spreads this over 60 loader workers + GPU +
eval thread pools.

  python -m pvn3d_tpu.apps.serve --checkpoint_dir runs/ycb --frames 200
  python -m pvn3d_tpu.apps.serve --source dir --frame_dir /path/frames \
      --torch_ckpt pvn3d_best.pth.tar

`--source dir` reads <stem>-color.png / <stem>-depth.png pairs (YCB
layout).  `--out poses.jsonl` writes one JSON record per frame.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", default="")
    p.add_argument("--torch_ckpt", default="")
    p.add_argument("--source", choices=("synthetic", "dir"),
                   default="synthetic")
    p.add_argument("--frame_dir", default="",
                   help="directory of <stem>-color.png/-depth.png pairs")
    p.add_argument("--cam_scale", type=float, default=10000.0,
                   help="depth units per meter for --source dir")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--out", default="", help="write poses as jsonl")
    p.add_argument("--no_fill_depth", action="store_true")
    p.add_argument("--platform", default="",
                   help="force a jax backend (e.g. 'cpu')")
    return p


def _frame_source(args, h, w):
    """Yield (rgb f32 (H,W,3), depth_m f32 (H,W), K (3,3)) forever."""
    if args.source == "dir":
        from PIL import Image
        stems = sorted(
            p[:-10] for p in glob.glob(
                os.path.join(args.frame_dir, "*-color.png")))
        if not stems:
            raise SystemExit(f"no *-color.png under {args.frame_dir}")
        k = np.array([[1066.778, 0, 312.986], [0, 1067.487, 241.310],
                      [0, 0, 1]], np.float32)
        i = 0
        while True:
            stem = stems[i % len(stems)]
            with Image.open(stem + "-color.png") as im:
                rgb = np.asarray(im)[..., :3].astype(np.float32)
            with Image.open(stem + "-depth.png") as im:
                depth = np.asarray(im).astype(np.float32) / args.cam_scale
            yield rgb, depth, k
            i += 1
    else:
        from benchmarks.raw_pipeline_bench import synth_sensor_frame
        i = 0
        while True:
            rgb, depth, k = synth_sensor_frame(h, w, seed=i % 16)
            yield rgb[0], depth[0], k[0]
            i += 1


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.platform:
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)
    from pvn3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pvn3d_tpu.config import Config
    from pvn3d_tpu.data.device_frame import build_inference_batch_device
    from pvn3d_tpu.data.synthetic import synthetic_batch
    from pvn3d_tpu.inference.pipeline import make_pose_fn
    from pvn3d_tpu.models.pvn3d import PVN3D
    from pvn3d_tpu.train.state import create_train_state
    from pvn3d_tpu.utils.assets import stacked_class_radii, stacked_mesh_kps

    cfg = Config.ycb()
    mc = cfg.model
    state, model, _ = create_train_state(
        cfg, jax.random.PRNGKey(0), synthetic_batch(cfg, batch_size=1))
    if args.torch_ckpt:
        from pvn3d_tpu.utils.torch_convert import load_state_from_torch
        state = load_state_from_torch(state, args.torch_ckpt)
    elif args.checkpoint_dir:
        from pvn3d_tpu.train.checkpoint import CheckpointManager
        state = CheckpointManager(args.checkpoint_dir).restore(state) or state
    else:
        print("WARNING: serving RANDOM weights (latency run only)",
              flush=True)
    eval_model = model.clone(train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pose_fn = make_pose_fn(cfg, stacked_mesh_kps("ycb", mc.n_classes),
                           stacked_class_radii("ycb", mc.n_classes))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step(rgb, depth, cam_k, i):
        b = build_inference_batch_device(
            rgb[None], depth[None], cam_k[None], jax.random.fold_in(key, i),
            n_sample=mc.n_sample_points, fill=not args.no_fill_depth)
        out = eval_model.apply(variables, b["pointcloud"], rgb[None],
                               b["choose"])
        seg = jnp.argmax(out["seg_logits"], axis=-1).astype(jnp.int32)
        frame = pose_fn(b["pointcloud"][..., :3], seg, out["ctr_offsets"],
                        out["kp_offsets"])
        return frame.poses[0], frame.present[0]

    src = _frame_source(args, mc.image_height, mc.image_width)
    sink = open(args.out, "w") if args.out else None
    lat = []
    pending = None          # (poses, t_submitted, frame_idx)
    t_start = None
    total = args.warmup + args.frames
    for i in range(total + 1):
        if i < total:
            rgb, depth, k = next(src)
            t_sub = time.perf_counter()
            if args.warmup == 0 and i == 0:
                # No warmup: the rate clock must cover frame 0's whole
                # latency, so it starts at its submission, not completion.
                t_start = t_sub
            poses = step(jnp.asarray(rgb), jnp.asarray(depth),
                         jnp.asarray(k), i)
        else:
            poses, t_sub = None, None
        if pending is not None:
            p_poses, p_t, p_i = pending
            # Value fetch, not block_until_ready: the tunnel's block can
            # return early (utils/profiling.py) and the poses are read
            # below anyway.
            p_poses = jax.device_get(p_poses)
            done = time.perf_counter()
            if p_i >= args.warmup:
                lat.append(done - p_t)
            if p_i == args.warmup - 1:
                t_start = done
            if sink is not None and p_i >= args.warmup:
                poses_arr, present = (np.asarray(p_poses[0]),
                                      np.asarray(p_poses[1]))
                sink.write(json.dumps(
                    {"frame": p_i - args.warmup,
                     "present": present.nonzero()[0].tolist(),
                     "poses": poses_arr[present > 0].tolist()}) + "\n")
        pending = (poses, t_sub, i) if poses is not None else None
    if sink is not None:
        sink.close()

    lat_ms = np.asarray(sorted(lat)) * 1e3
    wall = time.perf_counter() - (t_start or time.perf_counter())
    fps = args.frames / wall if wall > 0 else 0.0
    print(json.dumps({
        "metric": "serving_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "latency_ms": {
            "p50": round(float(np.percentile(lat_ms, 50)), 2),
            "p90": round(float(np.percentile(lat_ms, 90)), 2),
            "p99": round(float(np.percentile(lat_ms, 99)), 2),
        },
        "frames": args.frames,
        "note": "per-frame dispatch latency incl. host decode overlap; "
                "bench.py reports the scan-amortized throughput ceiling",
    }))


if __name__ == "__main__":
    main()
