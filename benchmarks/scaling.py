"""Data-parallel scaling efficiency of the train step.

Measures steps/s and frames/s of the jitted train step over growing dp mesh
sizes on the available devices, reporting efficiency vs linear scaling —
the BASELINE "1 chip / 1 host / N hosts" measurement, runnable on any
slice (on a CPU host it exercises the measurement plumbing with virtual
devices; numbers are only meaningful on real chips).

  python -m benchmarks.scaling [--tiny] [--per_device_batch 2] [--steps 5]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def measure(dp: int, cfg, per_device_batch: int, steps: int) -> float:
    import jax.numpy as jnp

    from pvn3d_tpu.data.synthetic import synthetic_batch
    from pvn3d_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from pvn3d_tpu.train.state import create_train_state
    from pvn3d_tpu.train.step import make_train_step

    mesh = make_mesh(dp=dp, sp=1, devices=jax.devices()[:dp])
    batch_size = per_device_batch * dp
    batch = synthetic_batch(cfg, batch_size=batch_size,
                            n_points=cfg.model.n_sample_points,
                            height=cfg.model.image_height,
                            width=cfg.model.image_width)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    with mesh:
        state = jax.device_put(state, replicated(mesh))
        dev_batch = shard_batch(mesh, batch)
        state, m = step(state, dev_batch, rng)      # compile
        float(jax.device_get(m["loss"]))            # value fetch = real sync
        t0 = time.perf_counter()
        for i in range(steps):
            b2 = dict(dev_batch,
                      pointcloud=dev_batch["pointcloud"] + i * 1e-6)
            state, m = step(state, b2, rng)
        # The tunnel's block_until_ready can return early (profiling.py);
        # fetch the chained loss value instead.
        float(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0) / steps
    return batch_size / dt                           # frames/s


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (CPU-mesh plumbing check)")
    p.add_argument("--per_device_batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=5)
    from pvn3d_tpu.utils.platform import (add_platform_args,
                                           apply_platform)
    add_platform_args(p)
    args = p.parse_args(argv)
    apply_platform(args)

    from pvn3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.tiny:
        import __graft_entry__ as graft
        cfg = graft._tiny_config()
    else:
        from pvn3d_tpu.config import Config
        cfg = Config.ycb()

    n = jax.device_count()
    sizes = sorted({1, 2, 4, 8, n} & set(range(1, n + 1)))
    results = {}
    base = None
    for dp in sizes:
        fps = measure(dp, cfg, args.per_device_batch, args.steps)
        base = base or fps
        eff = fps / (base * dp)
        results[dp] = {"frames_per_s": round(fps, 2),
                       "efficiency_vs_linear": round(eff, 3)}
        print(json.dumps({"dp": dp, **results[dp]}), flush=True)
    return results


if __name__ == "__main__":
    main()
