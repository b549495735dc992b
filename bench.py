"""Single-chip inference benchmark: PVN3D forward frames/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
commonly reported PVN3D end-to-end rate on its 2019-era GPU is ~5 fps
(~200 ms/frame).  vs_baseline = fps / 5.0.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.config import Config
from pvn3d_tpu.data.synthetic import synthetic_batch
from pvn3d_tpu.models.pvn3d import PVN3D

BASELINE_FPS = 5.0


def main():
    cfg = Config.ycb()
    model = PVN3D(cfg=cfg.model, train=False)
    batch = synthetic_batch(cfg, batch_size=1, seed=0)
    pointcloud = jnp.asarray(batch["pointcloud"])
    rgb = jnp.asarray(batch["rgb"])
    choose = jnp.asarray(batch["choose"])

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(rng, pointcloud, rgb, choose)

    @jax.jit
    def forward(pc, im, ch):
        return model.apply(variables, pc, im, ch)

    out = forward(pointcloud, rgb, choose)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(pointcloud, rgb, choose)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "inference_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
