"""Derived A100 throughput estimate for the reference PVN3D pipeline.

BASELINE.json's perf target is ">=2x A100 inference fps/chip", but the
reference publishes no throughput at all (BASELINE.md) — the only number
in circulation is a ~5 fps anecdote on a 2019 GPU.  This module replaces
the anecdote with a transparent cost model of the reference's own eval
pipeline (as written, batch 1, `eval_one_frame_pose`), with every count
cited to reference code and every hardware constant stated.  It is
intentionally *favorable to the reference* at the optimistic end: real
numbers would be slower.

Stage model (per frame):

1. Network forward — torch fp32/TF32.  FLOPs are taken from OUR
   architecture-identical forward (measured via XLA cost analysis, see
   ``measured_forward_flops``), divided by A100 TF32 peak (156 TFLOP/s)
   times an MFU grant.  Batch-1 point-cloud workloads do not reach 40%
   MFU on any GPU; granting it anyway only raises the baseline.

2. Vote clustering — the dominant stage.  Per detected class the
   reference runs MeanShiftTorch.fit (meanshift_pytorch.py:25-50):
     * once in the center-cluster filter (pvn3d_eval_utils.py:53-57),
     * once more for the center in the pose loop (:85),
     * once per keypoint, 8 keypoints (:96-97),
   i.e. 10 fits/class.  Every fit iterates until max-shift < bw*1e-3 or
   300 iters; each iteration materializes THREE (K, K, 3) repeats plus
   (K, K) distance/weight maps (:32-38) — ~9 K^2 f32 values of traffic —
   launches ~10 kernels, and ends in a host-blocking scalar compare
   (``torch.max(Adis) < self.stop_thresh``, :41).  The eval thread pool
   (eval_pose_parallel) overlaps the sync latency across frames but all
   kernels share torch's default CUDA stream, so GPU-busy time is the
   floor we charge.

3. Mask refinement + SVD fit + ADD metrics — one (N, n_ctrs) distance
   map (:60-64), tiny SVDs on host, per-class mesh transforms; charged
   as a flat small cost.

Run ``python -m benchmarks.a100_baseline`` for the parameter table.
"""
from __future__ import annotations

import json

# --- A100 hardware constants (public spec sheet) -------------------------
A100_TF32_FLOPS = 156e12          # dense TF32 with sparsity off
A100_HBM_BW = 2.0e12              # bytes/s (80GB SXM)
KERNEL_LAUNCH_S = 3e-6            # per-kernel launch+dispatch floor

# --- reference pipeline counts (cited above) -----------------------------
FITS_PER_CLASS = 10               # 2 center fits + 8 keypoint fits
KERNELS_PER_ITER = 10             # repeats/norm/exp/mul/sums/div/norm/max


def meanshift_seconds(k_points: float, iters: float) -> float:
    """GPU-busy seconds of one MeanShiftTorch.fit."""
    bytes_per_iter = 9.0 * k_points * k_points * 4.0
    t_mem = bytes_per_iter / A100_HBM_BW
    t_launch = KERNELS_PER_ITER * KERNEL_LAUNCH_S
    return iters * max(t_mem, t_launch)


def frame_seconds(forward_flops: float, n_classes: float, k_points: float,
                  iters: float, mfu: float) -> float:
    t_fwd = forward_flops / (A100_TF32_FLOPS * mfu)
    t_cluster = n_classes * FITS_PER_CLASS * meanshift_seconds(
        k_points, iters)
    t_rest = 1e-3                  # mask refine + SVD + metrics
    return t_fwd + t_cluster + t_rest


# Our full YCB forward, measured once on-chip via
# jax.jit(forward).lower(...).compile().cost_analysis()["flops"]
# (same macro-architecture as the reference's network).
MEASURED_FORWARD_FLOPS = 125e9


def estimate(forward_flops: float = MEASURED_FORWARD_FLOPS) -> dict:
    """Optimistic / central / conservative A100 fps for the reference.

    The scenario axes are the per-frame clustering size: number of
    detected classes (YCB keyframes average ~4-6 visible objects),
    class point count K out of the 12288 samples, and iterations to the
    bw*1e-3 convergence threshold.
    """
    scenarios = {
        # name: (n_classes, K, iters, mfu)
        "optimistic": (4.0, 400.0, 10.0, 0.40),
        "central": (5.0, 1200.0, 20.0, 0.20),
        "conservative": (6.0, 2500.0, 40.0, 0.10),
    }
    out = {}
    for name, (ncls, k, iters, mfu) in scenarios.items():
        t = frame_seconds(forward_flops, ncls, k, iters, mfu)
        out[name] = round(1.0 / t, 2)
    return out


def main():
    est = estimate()
    print(json.dumps({
        "metric": "a100_reference_fps_estimate",
        "fps": est,
        "forward_flops": MEASURED_FORWARD_FLOPS,
        "model": "bandwidth/launch-bound MeanShift stage "
                 "(10 fits/class, 9K^2 floats/iter, cited in module "
                 "docstring) + TF32 forward + 1 ms fit/metrics",
    }))
    return est


if __name__ == "__main__":
    main()
