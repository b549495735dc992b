"""Per-level ball-query microbench: pallas fused kernel vs approx_min_k.

Levels mirror PointNet2Config.sa_levels (config.py:149-157): the query at
level i runs over the previous level's npoint points (12288 at L0).
Run on the real chip: python -m benchmarks.query_bench [--iters 50]
"""
from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.config import Config
from pvn3d_tpu.ops.grouping import ball_query_multi
from pvn3d_tpu.ops.pallas.query import ball_query_pallas
from pvn3d_tpu.utils import cache
from pvn3d_tpu.utils.profiling import device_loop_time


def synth_cloud(n: int, seed: int = 0) -> np.ndarray:
    """Plane + blobs in scanline order — the realistic depth-cloud stand-in
    used by the fidelity measurements (CLAUDE.md)."""
    rng = np.random.RandomState(seed)
    g = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.linspace(-0.5, 0.5, g), np.linspace(-0.5, 0.5, g))
    plane = np.stack([xs, ys, 0.8 + 0.02 * rng.randn(g, g)], -1).reshape(-1, 3)
    k = n - plane.shape[0]
    blob = rng.randn(max(k, 1), 3) * 0.05 + np.array([0.1, 0.0, 0.7])
    pts = np.concatenate([plane, blob[:k]], 0)[:n]
    return pts.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--capacity", type=int, default=2)
    from pvn3d_tpu.utils.platform import (add_platform_args,
                                           apply_platform)
    add_platform_args(ap)
    args = ap.parse_args()
    apply_platform(args)
    cache.enable_compilation_cache()

    cfg = Config()
    pn2 = cfg.model.pointnet2
    ns_in = [cfg.model.n_sample_points] + [
        l.npoint for l in pn2.sa_levels[:-1]]
    for li, (lvl, n_in) in enumerate(zip(pn2.sa_levels, ns_in)):
        pts = np.stack([synth_cloud(n_in, s) for s in range(args.batch)])
        xyz = jnp.asarray(pts)
        cen = xyz[:, : lvl.npoint]

        def run_mode(mode):
            @functools.partial(jax.jit, static_argnames=("mode",))
            def step(i, mode):
                x = xyz + i * 1e-6
                out = ball_query_multi(lvl.radii, lvl.nsamples, x,
                                       cen + i * 1e-6, mode=mode)
                return sum(jnp.sum(o) for o in out).astype(jnp.float32)
            return device_loop_time(lambda i: step(i, mode), args.iters)

        t_pal = run_mode("pallas") * 1e3
        t_apx = run_mode("approx") * 1e3

        # Fidelity vs exact on this cloud.
        exact = ball_query_multi(lvl.radii, lvl.nsamples, xyz, cen,
                                 mode="exact")
        pal = ball_query_pallas(lvl.radii, lvl.nsamples, xyz, cen,
                                capacity=args.capacity,
                                interpret=jax.default_backend() != "tpu")
        recalls = []
        for e, p in zip(exact, pal):
            e, p = np.asarray(e[0]), np.asarray(p[0])
            recalls.append(np.mean([
                len(set(p[i]) & set(e[i])) / max(len(set(e[i])), 1)
                for i in range(0, e.shape[0], 7)]))
        print(f"L{li} N={n_in:>5} m={lvl.npoint:>4}: "
              f"pallas {t_pal:7.3f} ms  approx {t_apx:7.3f} ms  "
              f"speedup {t_apx / t_pal:4.1f}x  "
              f"recall {['%.4f' % r for r in recalls]}", flush=True)


if __name__ == "__main__":
    main()
