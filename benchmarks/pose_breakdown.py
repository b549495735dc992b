"""Per-piece timing of the pose (cluster+fit) stage on the chip.

The pose stage reads ~2.1 ms floor-corrected (stage_breakdown).  This
bench times its components as separate jitted programs on realistic
shapes (N=12288 points, 21 foreground classes, K=512, 8 keypoints):
class-point selection (runs twice per frame), the MeanShift winner pass,
the winner-seed iteration loop, the keypoint-vote gather, the batched
Umeyama fit, and the full cal_frame_poses for reference.

  python -m benchmarks.pose_breakdown [--iters 200]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.config import Config
from pvn3d_tpu.geometry.se3 import best_fit_transform
from pvn3d_tpu.inference.meanshift import _winner_stats, mean_shift_fit
from pvn3d_tpu.inference.pose import _select_class_points, cal_frame_poses
from pvn3d_tpu.utils import cache
from pvn3d_tpu.utils.assets import stacked_class_radii, stacked_mesh_kps
from pvn3d_tpu.utils.profiling import device_loop_time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=200)
    from pvn3d_tpu.utils.platform import add_platform_args, apply_platform
    add_platform_args(ap)
    args = ap.parse_args()
    apply_platform(args)
    cache.enable_compilation_cache()

    cfg = Config.ycb()
    n, n_cls, n_kps = 12288, 22, 8
    k = cfg.cluster.max_points_per_class
    bw = cfg.cluster.bandwidth
    rng = np.random.RandomState(0)
    pcld = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, n_cls, (n,)).astype(np.int32))
    ctr_of = jnp.asarray(0.05 * rng.randn(1, n, 3).astype(np.float32))
    kp_of = jnp.asarray(0.05 * rng.randn(n_kps, n, 3).astype(np.float32))
    mesh_kps = jnp.asarray(stacked_mesh_kps("ycb", n_cls))
    radii = jnp.asarray(stacked_class_radii("ycb", n_cls))

    votes = jnp.asarray(0.03 * rng.randn(n_cls - 1, k, 3).astype(np.float32))
    valid = jnp.asarray(rng.rand(n_cls - 1, k) < 0.8)
    kp_votes = jnp.asarray(
        0.03 * rng.randn((n_cls - 1) * n_kps, k, 3).astype(np.float32))
    kp_valid = jnp.asarray(rng.rand((n_cls - 1) * n_kps, k) < 0.8)

    out = {}

    def time_it(name, fn):
        out[name] = device_loop_time(fn, args.iters)
        print(f"{name}: {out[name] * 1e3:.3f} ms", flush=True)

    time_it("select_class_points",
            lambda i: jnp.sum(_select_class_points(
                jnp.where(pcld[:, 0] + i * 1e-6 > 10, 0, mask),
                n_cls, k)[0]))
    for impl in ("xla", "pallas"):
        time_it(f"winner_stats_ctr_{impl}",
                lambda i, impl=impl: jnp.sum(_winner_stats(
                    votes + i * 1e-6, valid, bw, 16, impl=impl)[2]))
        time_it(f"winner_stats_kp_{impl}",
                lambda i, impl=impl: jnp.sum(_winner_stats(
                    kp_votes + i * 1e-6, kp_valid, bw, 16, impl=impl)[2]))
    time_it("meanshift_ctr_full",
            lambda i: jnp.sum(mean_shift_fit(
                votes + i * 1e-6, valid, bw, max_iter=300)[0]))
    time_it("meanshift_kp_full",
            lambda i: jnp.sum(mean_shift_fit(
                kp_votes + i * 1e-6, kp_valid, bw, max_iter=300)[0]))
    sel = jnp.asarray(rng.randint(0, n, (n_cls - 1, k)).astype(np.int32))
    time_it("kp_vote_gather",
            lambda i: jnp.sum(jnp.transpose(
                (pcld[None, :, :] - (kp_of + i * 1e-6))[:, sel, :],
                (1, 0, 2, 3))))
    tgt = jnp.asarray(0.03 * rng.randn(n_cls - 1, n_kps + 1, 3)
                      .astype(np.float32))
    time_it("umeyama_fit",
            lambda i: jnp.sum(best_fit_transform(
                mesh_kps[1:], tgt + i * 1e-6)))
    time_it("cal_frame_poses_full",
            lambda i: jnp.sum(cal_frame_poses(
                pcld + i * 1e-6, mask, ctr_of, kp_of, mesh_kps, radii,
                n_cls=n_cls, n_kps=n_kps, k=k, bandwidth=bw,
                max_iter=cfg.cluster.max_iter).poses))

    ms = {kk: round(v * 1e3, 3) for kk, v in out.items()}
    print(json.dumps({"piece_ms": ms, "iters": args.iters,
                      "note": "each number still carries ~27ms/iters of "
                              "tunnel dispatch floor"}))


if __name__ == "__main__":
    main()
