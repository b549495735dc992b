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


# Fallback for measured_forward_flops() when live XLA cost analysis is
# unavailable (last live value, full YCB dense forward, 2026-08).
# History: rounds 1-3 hardcoded 125e9 here — ~5x LOW (it predated the
# full-size image path).  Hand-check of the live 623e9: the stride-8
# ResNet34 tail at 480x640 alone is ~320 GFLOP (layer4 runs 16x the
# spatial positions of the standard stride-32 net) and the three
# 1792-wide heads ~176 GFLOP.  The error was conservative (it UNDERstated
# the reference's forward cost, overstating its fps).
FALLBACK_FORWARD_FLOPS = 6.23e11
_FLOPS_CACHE: list = []
_FLOPS_SOURCE: list = []


def measured_forward_flops() -> float:
    """Forward FLOPs of the reference-graph network, measured live.

    Builds the full YCB-config model with every FLOP-changing eval
    restructure disabled (dense CNN tail, literal fusion concat, no
    SA/FP precompute splits, no fused upsample) so the count tracks the
    REFERENCE architecture's arithmetic as the repo evolves, and reads
    XLA's HLO cost analysis off the lowered module — no hardcoded
    constant to rot.  Host-side only (no device compile/execute)."""
    if _FLOPS_CACHE:
        return _FLOPS_CACHE[0]
    try:
        import dataclasses

        import jax
        import jax.numpy as jnp

        from pvn3d_tpu.config import Config
        from pvn3d_tpu.models.pvn3d import PVN3D

        cfg = Config.ycb()
        mc = dataclasses.replace(
            cfg.model,
            sparse_cnn_eval=False, head_split_global=False,
            cnn=dataclasses.replace(cfg.model.cnn, fuse_upsample=False),
            pointnet2=dataclasses.replace(
                cfg.model.pointnet2, sa_precompute_first=False,
                fp_precompute_first=False, query_mode="exact",
                interp_mode="exact", fps_mode="xla"))
        model = PVN3D(cfg=mc, train=False, sparse_cnn=False)
        pc = jax.ShapeDtypeStruct((1, mc.n_sample_points, 9), jnp.float32)
        rgb = jax.ShapeDtypeStruct(
            (1, mc.image_height, mc.image_width, 3), jnp.float32)
        ch = jax.ShapeDtypeStruct((1, mc.n_sample_points), jnp.int32)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                   pc, rgb, ch)
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables)
        # Lower on the CPU backend: the axon/TPU client returns None from
        # Lowered.cost_analysis() (probed live, jax 0.9), and FLOP counts
        # are HLO-level — backend-independent.
        with jax.default_device(jax.devices("cpu")[0]):
            flops = float(jax.jit(model.apply).lower(
                params, pc, rgb, ch).cost_analysis()["flops"])
        source = "live"
    except Exception as e:
        # Loud fallback (ADVICE r4): a silent constant is exactly the
        # rot this function exists to eliminate.  The tag is surfaced in
        # bench.py's JSON as "flops_source".
        import sys
        print(f"a100_baseline: live XLA cost analysis failed ({e!r}); "
              f"using FALLBACK_FORWARD_FLOPS={FALLBACK_FORWARD_FLOPS:.3g}",
              file=sys.stderr, flush=True)
        flops = FALLBACK_FORWARD_FLOPS
        source = "fallback"
    _FLOPS_CACHE.append(flops)
    _FLOPS_SOURCE.append(source)
    return flops


def flops_source() -> str:
    """"live" | "fallback" | "unmeasured" — provenance of the FLOP count."""
    return _FLOPS_SOURCE[0] if _FLOPS_SOURCE else "unmeasured"


def estimate(forward_flops: float | None = None) -> dict:
    """Optimistic / central / conservative A100 fps for the reference.

    The scenario axes are the per-frame clustering size: number of
    detected classes (YCB keyframes average ~4-6 visible objects),
    class point count K out of the 12288 samples, and iterations to the
    bw*1e-3 convergence threshold.
    """
    if forward_flops is None:
        forward_flops = measured_forward_flops()
    scenarios = {
        # name: (n_classes, K, iters, mfu).  The (K, iters) axes are
        # grounded by measured distributions of the LITERAL reference
        # MeanShift on trained-model vote clouds
        # (benchmarks/meanshift_empirics.py -> meanshift_empirics.json,
        # synthetic world, 8 frames / 24 center fits / 192 kp fits):
        # center fits K median 2018 / p90 3341, iters median 8.5 /
        # p90 22 / max 54; keypoint fits K median 1712, iters median 5.
        # The optimistic arm understates measured K ~4-5x (favorable to
        # the reference — smaller K = cheaper fit); central sits between
        # the kp medians and the ctr p90; conservative tracks the ctr
        # p90s.  Synthetic objects are large — real YCB class masks are
        # typically smaller, so the K range brackets both regimes.
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
        "forward_flops": measured_forward_flops(),
        "flops_source": flops_source(),
        "model": "bandwidth/launch-bound MeanShift stage "
                 "(10 fits/class, 9K^2 floats/iter, cited in module "
                 "docstring) + TF32 forward + 1 ms fit/metrics",
    }))
    return est


if __name__ == "__main__":
    main()
