"""Sensor-to-pose throughput: raw rgb/depth in, poses out, one XLA program.

Measures ``make_raw_inference_step`` — ip_basic depth completion, normal
estimation, point sampling, feature assembly, CNN+PointNet++ forward,
MeanShift clustering, and SVD pose fit, ALL on-chip (the reference splits
this across 60 host worker processes + GPU + a Python eval thread pool;
the host twins cost ~70 ms/frame, benchmarks/loader_bench.py).

Methodology matches bench.py: T iterations inside one jitted ``lax.scan``
with iteration-dependent depth perturbation, synced once.

  python -m benchmarks.raw_pipeline_bench
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.utils.cache import enable_compilation_cache
from pvn3d_tpu.utils.profiling import device_loop_time
enable_compilation_cache()

from pvn3d_tpu.config import Config
from pvn3d_tpu.data.device_frame import build_inference_batch_device
from pvn3d_tpu.inference.pipeline import make_pose_fn
from pvn3d_tpu.models.pvn3d import PVN3D
from pvn3d_tpu.utils.assets import stacked_class_radii, stacked_mesh_kps

T = 50      # amortizes the ~27 ms fixed dispatch cost (see bench.py)


def synth_sensor_frame(h=480, w=640, seed=0):
    """Plane + box scene with sensor dropout, native YCB-ish depth."""
    rng = np.random.RandomState(seed)
    d = np.full((h, w), 1.2, np.float32)
    d += np.linspace(0, 0.3, w)[None, :]
    d[160:320, 200:440] = 0.8
    d += 0.002 * rng.randn(h, w).astype(np.float32)
    holes = rng.rand(h, w) < 0.05
    d[holes] = 0.0
    rgb = (rng.rand(h, w, 3) * 255).astype(np.float32)
    k = np.array([[1066.778, 0, 312.986],
                  [0, 1067.487, 241.310],
                  [0, 0, 1]], np.float32)
    return rgb[None], d[None], k[None]


def main():
    import argparse

    from pvn3d_tpu.utils.platform import add_platform_args, apply_platform
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=T)
    add_platform_args(ap)
    args = ap.parse_args()
    apply_platform(args)

    cfg = Config.ycb()
    model = PVN3D(cfg=cfg.model, train=False)
    rgb_np, depth_np, k_np = synth_sensor_frame(
        cfg.model.image_height, cfg.model.image_width)
    rgb = jnp.asarray(rgb_np)
    depth = jnp.asarray(depth_np)
    cam_k = jnp.asarray(k_np)
    n_sample = cfg.model.n_sample_points

    key = jax.random.PRNGKey(0)
    built = build_inference_batch_device(rgb, depth, cam_k, key,
                                         n_sample=n_sample)
    variables = jax.jit(model.init)(key, built["pointcloud"], rgb,
                                    built["choose"])
    pose_fn = make_pose_fn(cfg, stacked_mesh_kps("ycb", 22),
                           stacked_class_radii("ycb", 22))

    def frame_step(i):
        # Salt rgb too: a loop-invariant rgb would let XLA hoist the
        # whole CNN trunk out of the timed scan (bench.py caught this
        # live in round 3).
        rgb_i = rgb + i * 1e-6
        b = build_inference_batch_device(
            rgb_i, depth + i * 1e-6, cam_k,
            jax.random.fold_in(key, i.astype(jnp.int32)),
            n_sample=n_sample)
        out = model.apply(variables, b["pointcloud"], rgb_i, b["choose"])
        seg = jnp.argmax(out["seg_logits"], axis=-1).astype(jnp.int32)
        frame = pose_fn(b["pointcloud"][..., :3], seg,
                        out["ctr_offsets"], out["kp_offsets"])
        return jnp.sum(frame.poses)

    dt = device_loop_time(frame_step, iters=args.iters)
    print(json.dumps({
        "metric": "sensor_to_pose_fps_per_chip",
        "value": round(1.0 / dt, 3),
        "unit": "frames/s",
        "includes": "depth fill + normals + sampling + forward + "
                    "clustering + fit, one XLA program",
    }))


if __name__ == "__main__":
    main()
