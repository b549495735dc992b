"""Train-step throughput: host-built batches vs the raw-train device path.

Times the jitted train step over N steps (dispatches pipelined, one sync
at the end) for (a) pre-built batches (host did augment/fill/normals/
sampling) and (b) raw batches with build_train_batch_device fused into
the step (apps/train --device_preprocess).  The delta is the on-device
preprocessing cost; the host-side delta is measured by
loader_bench.py [--raw].

  python -m benchmarks.train_bench [--batch 4] [--steps 20] [--remat]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from pvn3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from pvn3d_tpu.config import Config, replace
from pvn3d_tpu.data.device_frame import build_train_batch_device
from pvn3d_tpu.data.synthetic import synthetic_batch
from pvn3d_tpu.train.state import create_train_state
from pvn3d_tpu.train.step import make_train_step


def synth_raw_batch(cfg, b: int, seed: int = 0):
    mc = cfg.model
    h, w = mc.image_height, mc.image_width
    rng = np.random.RandomState(seed)
    depth = (0.8 + 0.4 * rng.rand(b, h, w)).astype(np.float32)
    depth[:, ::9, ::7] = 0.0
    return {
        "rgb": rng.randint(0, 256, (b, h, w, 3)).astype(np.uint8),
        "depth": depth,
        "label_map": rng.randint(0, 4, (b, h, w)).astype(np.uint8),
        "cam_k": np.tile(np.array([[1066.8, 0, 313.0], [0, 1067.5, 241.3],
                                   [0, 0, 1]], np.float32), (b, 1, 1)),
        "cls_ids": np.tile(
            np.array([1, 2, 3] + [0] * 9, np.int32), (b, 1)),
        "rts": np.tile(np.eye(3, 4, dtype=np.float32), (b, 12, 1, 1)),
        "mesh_kps": rng.rand(b, 12, mc.n_keypoints, 3).astype(np.float32),
        "mesh_ctrs": rng.rand(b, 12, 3).astype(np.float32),
        "is_syn": (np.arange(b) % 2 == 0),
        "do_jitter": np.ones((b,), bool),
        "back_rgb": rng.randint(0, 256, (b, h, w, 3)).astype(np.uint8),
        "back_depth": (0.8 + 0.4 * rng.rand(b, h, w)).astype(np.float32),
        "back_label": rng.randint(0, 2, (b, h, w)).astype(np.uint8),
    }


def time_steps(step, state, batch, rng, n, floor_s_per_step=0.0):
    """Median-of-trials seconds/step (stats dict) + final state.

    Each trial times n chained steps ending in a VALUE FETCH: the
    tunnel's block_until_ready can return without blocking (see
    utils/profiling.py) — round-3's 10-13 ms batch-4 "train step" was
    3-10x past the bf16 roofline because of exactly this.  Trials route
    through device_loop_stats so one tunnel stall loses to the median
    instead of becoming the record (round-4's 137-vs-164 ms batch-4
    disagreement was single-trial noise with no spread annotation).
    """
    from pvn3d_tpu.utils.profiling import device_loop_stats

    holder = {"state": state}
    s1, m0 = step(holder["state"], batch, rng)   # compile + warm
    float(jax.device_get(m0["loss"]))            # value fetch = real sync
    holder["state"] = s1

    def timed():
        s = holder["state"]
        t0 = time.perf_counter()
        for _ in range(n):
            s, metrics = step(s, batch, rng)
        float(jax.device_get(metrics["loss"]))
        dt = time.perf_counter() - t0
        holder["state"] = s
        return dt

    stats = device_loop_stats(None, iters=n, trials=3,
                              floor_s_per_iter=floor_s_per_step,
                              _timed=timed)
    return stats, holder["state"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_policy", default="", choices=("", "full", "dots"))
    ap.add_argument("--grad_accum", type=int, default=0,
                    help="micro-batches per step (TrainConfig.grad_accum)")
    ap.add_argument("--skip_raw", action="store_true",
                    help="time only the host-built path (the remat/accum "
                         "ladder doesn't need the raw-path compile)")
    ap.add_argument("--host_batch", action="store_true",
                    help="feed numpy batches (re-upload per step) instead "
                         "of device-resident arrays — measures the H2D "
                         "path too.  apps/train overlaps uploads with "
                         "compute (loader.prefetch_to_device), so the "
                         "device-resident time is the steady-state step "
                         "cost; through THIS dev tunnel the upload is "
                         "~11-25 MB/s and dominates when not overlapped "
                         "(measured 1.98 s vs 0.14 s at batch 4)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke of the harness itself)")
    from pvn3d_tpu.utils.platform import (add_platform_args,
                                           apply_platform)
    add_platform_args(ap)
    args = ap.parse_args()
    apply_platform(args)

    if args.tiny:
        import __graft_entry__ as graft
        cfg = graft._tiny_config()
    else:
        cfg = Config.ycb()
    if args.remat:
        cfg = replace(cfg, train=replace(cfg.train, remat=True))
    if args.remat_policy:
        cfg = replace(cfg, train=replace(cfg.train,
                                         remat_policy=args.remat_policy))
    if args.grad_accum > 1:
        cfg = replace(cfg, train=replace(cfg.train,
                                         grad_accum=args.grad_accum))
    mc = cfg.model
    built = synthetic_batch(cfg, batch_size=args.batch)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), built)
    base = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(1)

    import jax.numpy as jnp
    if not args.host_batch:
        built = {k: jnp.asarray(v) for k, v in built.items()}
    # Physics floor for replay rejection: a train step cannot beat the
    # forward's measured FLOPs at bf16 peak (backward only adds work;
    # tiny config skips the floor — its FLOPs are unrelated).
    if args.tiny:
        floor = 0.0
    else:
        from benchmarks.a100_baseline import measured_forward_flops
        # grad_accum splits the batch into micro-batches (train/step.py:
        # 106-111) — total frames/step is args.batch either way.
        floor = args.batch * measured_forward_flops() / 197e12
    step_built = jax.jit(base, donate_argnums=(0,))
    st_built, state2 = time_steps(step_built, state, built, rng,
                                  args.steps, floor_s_per_step=floor)
    dt_built = st_built["s_per_iter"]

    if args.skip_raw:
        dt_raw = float("nan")
        st_raw = None
    else:
        raw = synth_raw_batch(cfg, args.batch)
        if not args.host_batch:
            raw = {k: jnp.asarray(v) for k, v in raw.items()}

        def step_raw(state, raw_b, rng):
            b_rng = jax.random.fold_in(rng, state.step)
            batch = build_train_batch_device(
                raw_b, b_rng, n_sample=mc.n_sample_points,
                n_classes=mc.n_classes, dataset="ycb")
            return base(state, batch, rng)

        st_raw, _ = time_steps(jax.jit(step_raw, donate_argnums=(0,)),
                               state2, raw, rng, args.steps,
                               floor_s_per_step=floor)
        dt_raw = st_raw["s_per_iter"]

    def _trialinfo(st):
        if st is None:
            return None
        return {"trials_ms_per_step": [round(t * 1e3 / args.steps, 2)
                                       for t in st["trials_s"]],
                "rejected_stall_ms": [round(t * 1e3 / args.steps, 2)
                                      for t in st["rejected_stall_s"]],
                "rejected_replay_ms": [round(t * 1e3 / args.steps, 2)
                                       for t in st["rejected_replay_s"]],
                "spread": st["spread"], "suspect": st["suspect"]}

    print(json.dumps({
        "metric": "train_frames_per_s_per_chip",
        "value": round(args.batch / dt_built, 2),
        "unit": "frames/s",
        "built_ms_per_step": round(dt_built * 1e3, 1),
        "raw_ms_per_step": round(dt_raw * 1e3, 1),
        "raw_frames_per_s": round(args.batch / dt_raw, 2),
        "built_trials": _trialinfo(st_built),
        "raw_trials": _trialinfo(st_raw),
        "batch": args.batch, "remat": args.remat,
        "host_batch": args.host_batch,
        "remat_policy": args.remat_policy or "full",
        "grad_accum": max(args.grad_accum, 1),
        "note": "raw = device-side augment+fill+normals+sampling+targets "
                "fused into the step (host decodes PNGs only)",
    }))


if __name__ == "__main__":
    main()
