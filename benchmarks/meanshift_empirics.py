"""Measure the reference MeanShift's iteration counts and problem sizes on
realistic vote distributions — the empirical grounding for the (K, iters)
scenario grid in ``benchmarks/a100_baseline.py``.

Protocol: train the model on the procedural world (or reuse a
``synthetic_e2e --save_ckpt`` checkpoint), run eval-mode forwards, extract
per-class vote clouds exactly as the reference's ``cal_frame_poses`` does
(pvn3d_eval_utils.py:37-110 — center votes of every predicted-class point,
keypoint votes filtered to the winning center cluster), then run the
LITERAL reference fixed point (meanshift_pytorch.py:24-51, reimplemented
below in torch on CPU with the same kernel, stopping rule and iteration
accounting) on every fit the reference would run, recording (K, iters).

  python -m benchmarks.meanshift_empirics [--ckpt ck.pkl] [--frames 8]

Writes ``benchmarks/meanshift_empirics.json`` and prints a summary line.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def reference_fit_iters(A, bandwidth: float, max_iter: int = 300):
    """Literal MeanShiftTorch.fit (meanshift_pytorch.py:24-51) with the
    iteration count exposed.  A: (K, 3) float32 torch tensor."""
    import torch

    bw = float(bandwidth)
    stop = bw * 1e-3
    inv_norm = 1.0 / (bw * np.sqrt(2.0 * np.pi))
    C = A.clone()
    it = 0
    while True:
        it += 1
        dis = torch.norm(C[:, None, :] - A[None, :, :], dim=2)
        w = (inv_norm * torch.exp(-0.5 * (dis / bw) ** 2))[..., None]
        new_C = (w * A[None]).sum(dim=1) / w.sum(dim=1)
        Adis = torch.norm(new_C - C, dim=1)
        C = new_C
        # Reference stopping rule verbatim (incl. `it > max_iter`, i.e.
        # up to max_iter+1 iterations run).
        if torch.max(Adis) < stop or it > max_iter:
            break
    d0 = torch.norm(A[:, None, :] - A[None, :, :], dim=2)
    num_in = (d0 < bw).sum(dim=1)
    max_idx = int(num_in.argmax())
    labels = d0[max_idx] < bw
    return it, C[max_idx], labels


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default="",
                   help="synthetic_e2e --save_ckpt pickle; trains "
                        "--steps from scratch when absent")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--out", default="benchmarks/meanshift_empirics.json")
    from pvn3d_tpu.utils.platform import add_platform_args, apply_platform
    add_platform_args(p)
    args = p.parse_args(argv)
    apply_platform(args)

    import jax
    import jax.numpy as jnp
    import torch

    from pvn3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from pvn3d_tpu.config import Config
    from pvn3d_tpu.data.synthetic_world import SyntheticWorld
    from pvn3d_tpu.train.state import create_train_state
    from pvn3d_tpu.train.step import make_train_step

    cfg = Config.ycb()
    h, w = cfg.model.image_height, cfg.model.image_width
    n_points = cfg.model.n_sample_points
    world = SyntheticWorld(n_classes=4,
                           n_keypoints=cfg.model.n_keypoints, seed=0)
    rng_np = np.random.RandomState(0)
    kw = dict(n_points=n_points, height=h, width=w)
    batch0 = world.sample_batch(rng_np, args.batch, **kw)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch0)

    if args.ckpt and os.path.exists(args.ckpt):
        import pickle
        with open(args.ckpt, "rb") as f:
            tree = pickle.load(f)
        state = state.replace(params=tree["params"],
                              batch_stats=tree["batch_stats"])
        print(f"loaded {args.ckpt}", flush=True)
    else:
        step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
        rng = jax.random.PRNGKey(1)
        for it in range(args.steps):
            batch = world.sample_batch(rng_np, args.batch, **kw)
            state, metrics = step(state, batch, rng)
            if it % 200 == 0 or it == args.steps - 1:
                print(f"it={it} loss={float(metrics['loss']):.3f}",
                      flush=True)
        if args.ckpt:
            import pickle
            with open(args.ckpt, "wb") as f:
                pickle.dump({"params": jax.device_get(state.params),
                             "batch_stats": jax.device_get(
                                 state.batch_stats)}, f)

    eval_model = model.clone(train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def forward(batch):
        out = eval_model.apply(variables, batch["pointcloud"], batch["rgb"],
                               batch["choose"])
        seg = jnp.argmax(out["seg_logits"], axis=-1).astype(jnp.int32)
        return seg, out["ctr_offsets"], out["kp_offsets"]

    bw = cfg.cluster.bandwidth
    n_kps = cfg.model.n_keypoints
    ctr_fits = []      # (K, iters) of whole-class center fits
    kp_fits = []       # (K, iters) of cluster-filtered keypoint fits
    classes_per_frame = []
    n_done = 0
    while n_done < args.frames:
        batch = world.sample_batch(rng_np, args.batch, **kw)
        seg, ctr_of, kp_of = jax.device_get(forward(batch))
        pcld = np.asarray(batch["pointcloud"][..., :3])
        for b in range(min(args.batch, args.frames - n_done)):
            n_cls_here = 0
            for cls in range(1, 5):
                msk = seg[b] == cls
                k = int(msk.sum())
                if k < 2:
                    continue
                n_cls_here += 1
                votes = torch.tensor(
                    (pcld[b] - ctr_of[b, 0])[msk].astype(np.float32))
                it, _, labels = reference_fit_iters(votes, bw)
                ctr_fits.append((k, it))
                labels = labels.numpy()
                for kp in range(n_kps):
                    kv = (pcld[b] - kp_of[b, kp])[msk][labels]
                    if kv.shape[0] < 2:
                        continue
                    it_k, _, _ = reference_fit_iters(
                        torch.tensor(kv.astype(np.float32)), bw)
                    kp_fits.append((int(kv.shape[0]), it_k))
            classes_per_frame.append(n_cls_here)
        n_done += args.batch
        print(f"frames={n_done} ctr_fits={len(ctr_fits)} "
              f"kp_fits={len(kp_fits)}", flush=True)

    def stats(pairs, col):
        a = np.asarray([p[col] for p in pairs], np.float64)
        return {"median": float(np.median(a)), "p90": float(
            np.percentile(a, 90)), "max": float(a.max()),
            "mean": float(a.mean())}

    result = {
        "bandwidth": bw,
        "frames": n_done,
        "classes_per_frame": stats([(c,) for c in classes_per_frame], 0),
        "ctr_fit_K": stats(ctr_fits, 0),
        "ctr_fit_iters": stats(ctr_fits, 1),
        "kp_fit_K": stats(kp_fits, 0),
        "kp_fit_iters": stats(kp_fits, 1),
        "n_ctr_fits": len(ctr_fits),
        "n_kp_fits": len(kp_fits),
        "note": "literal reference MeanShift (meanshift_pytorch.py:24-51) "
                "on eval-mode vote clouds of a synthetic-world-trained "
                "model; grounds the a100_baseline scenario grid",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
