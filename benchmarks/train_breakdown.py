"""Decompose the train step's device time by branch.

The honest train step (509 ms @ batch 4) runs at ~8% MFU while the eval
forward runs at ~40% — this locates the backward's sink.  Methodology:
time ``jax.grad`` with respect to PARAM SUBTREES — XLA prunes the
backward of branches whose params are frozen (their activations' VJPs
stop at the branch output), so

  t(all) - t(all minus pointnet2)   ~ pointnet2 backward cost
  t(all minus cnn)                  ~ step without CNN backward, etc.

plus the train-mode forward alone (loss value, no grad).  Sync is by
value fetch (utils/profiling.py rationale).

  python -m benchmarks.train_breakdown [--batch 4] [--steps 10]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from pvn3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from pvn3d_tpu.config import Config
from pvn3d_tpu.data.synthetic import synthetic_batch
from pvn3d_tpu.train.state import create_train_state
from pvn3d_tpu.train.step import compute_losses


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--tiny", action="store_true")
    from pvn3d_tpu.utils.platform import add_platform_args, apply_platform
    add_platform_args(p)
    args = p.parse_args(argv)
    apply_platform(args)

    if args.tiny:
        import __graft_entry__ as graft
        cfg = graft._tiny_config()
    else:
        cfg = Config.ycb()
    batch = synthetic_batch(cfg, batch_size=args.batch)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = state.params
    stats = state.batch_stats
    rng = jax.random.PRNGKey(2)

    def loss_of(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats},
            batch["pointcloud"], batch["rgb"], batch["choose"], 0.9,
            mutable=["batch_stats"], rngs={"dropout": rng})
        return compute_losses(cfg, out, batch)["loss"]

    def timed(fn, *a):
        out = fn(*a)                      # compile + warm
        float(jax.device_get(jax.tree_util.tree_leaves(out)[0].sum()
                             if hasattr(jax.tree_util.tree_leaves(out)[0],
                                        "sum")
                             else jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for i in range(args.steps):
            out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.device_get(leaf.sum() if hasattr(leaf, "sum") else leaf))
        return (time.perf_counter() - t0) / args.steps * 1e3

    results = {}

    fwd = jax.jit(loss_of)
    results["forward_train_ms"] = round(timed(fwd, params), 1)
    print(f"forward(train): {results['forward_train_ms']} ms", flush=True)

    def grad_wrt(keys):
        sub = {k: params[k] for k in keys}
        rest = {k: v for k, v in params.items() if k not in keys}

        def f(s):
            merged = dict(rest, **s)
            return loss_of(merged)
        return jax.jit(jax.grad(f))

    all_keys = sorted(params.keys())
    groups = {
        "all": all_keys,
        "cnn_only": ["cnn"],
        "pointnet2_only": ["pointnet2"],
        "heads_only": [k for k in all_keys
                       if k not in ("cnn", "pointnet2")],
    }
    for name, keys in groups.items():
        g = grad_wrt([k for k in keys if k in params])
        sub = {k: params[k] for k in keys if k in params}
        ms = round(timed(g, sub), 1)
        results[f"grad_{name}_ms"] = ms
        print(f"grad wrt {name}: {ms} ms", flush=True)

    print(json.dumps({"train_breakdown_ms": results,
                      "batch": args.batch, "steps": args.steps}))


if __name__ == "__main__":
    main()
