"""Component-level device-time breakdown of the PointNet++ trunk.

The full pointnet2 stage reads ~3.2 ms at B=1 (stage_breakdown) — this
splits it into FPS, per-level ball query, grouping gathers, SA shared-MLP
matmuls, and FP interpolate+MLP at the exact YCB-config shapes, so kernel
work targets the measured hot spot (VERDICT r3 #3: fusing grouping into
the query kernel is only worth building if the gathers actually dominate).

  python -m benchmarks.pn2_breakdown [--iters 100] [--batch 1]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from pvn3d_tpu.config import Config
from pvn3d_tpu.models.layers import SharedMLP
from pvn3d_tpu.ops import furthest_point_sample
from pvn3d_tpu.ops.grouping import ball_query_multi, group_points
from pvn3d_tpu.utils.profiling import device_loop_time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--batch", type=int, default=1)
    from pvn3d_tpu.utils.platform import add_platform_args, apply_platform
    add_platform_args(p)
    args = p.parse_args(argv)
    apply_platform(args)

    cfg = Config.ycb()
    pcfg = cfg.model.pointnet2
    b = args.batch
    n = cfg.model.n_sample_points
    rng = jax.random.PRNGKey(0)
    dtype = jnp.dtype(cfg.model.compute_dtype)

    # Floor calibration: a trivial op inside the same harness.  Min of
    # three — one slow tunnel fetch in a single floor run once pushed
    # every subtracted number negative.
    floor = min(device_loop_time(lambda i: jnp.sum(i), iters=args.iters)
                for _ in range(3))

    results = {}

    def time_op(name, fn):
        ms = (device_loop_time(fn, iters=args.iters) - floor) * 1e3
        results[name] = round(ms, 3)
        print(f"{name:>28}: {ms:7.3f} ms", flush=True)

    xyz = jax.random.normal(rng, (b, n, 3)) * 0.2
    feats = jax.random.normal(rng, (b, n, 6))

    # FPS: only level 0 runs (fps_prefix elides 1-3).
    m0 = pcfg.sa_levels[0].npoint
    time_op("fps_L0", lambda i: jnp.sum(
        furthest_point_sample(xyz + i * 1e-6, m0)))

    # Per-level shapes: level i consumes level i-1's output.
    level_n = [n] + [lvl.npoint for lvl in pcfg.sa_levels]
    c_in = [9 + 0]  # xyz(3)+feat(6) -> use_xyz concat: 3 + C
    c = 6
    for lvl in pcfg.sa_levels:
        c_in.append(sum(w[-1] for w in lvl.mlps))

    for li, lvl in enumerate(pcfg.sa_levels):
        src_n = level_n[li]
        src_c = 6 if li == 0 else c_in[li + 0]
        sxyz = jax.random.normal(jax.random.fold_in(rng, li),
                                 (b, src_n, 3)) * 0.2
        sfeat = jax.random.normal(jax.random.fold_in(rng, 100 + li),
                                  (b, src_n, src_c))
        cen = sxyz[:, :lvl.npoint]

        time_op(f"query_L{li}", lambda i, sxyz=sxyz, cen=cen, lvl=lvl:
                sum(jnp.sum(g) for g in ball_query_multi(
                    lvl.radii, lvl.nsamples, sxyz + i * 1e-6, cen,
                    mode=pcfg.query_mode, capacity=pcfg.query_capacity)))

        # Gathers + first-layer-precomputed MLP per scale (the eval path:
        # rel_xyz gather, W0-channel pre gather, 3-channel matmul + BN/relu
        # chain, max pool).
        idx = ball_query_multi(lvl.radii, lvl.nsamples, sxyz, cen,
                               mode=pcfg.query_mode,
                               capacity=pcfg.query_capacity)
        idx = [jnp.asarray(g) for g in idx]

        def gathers(i, sxyz=sxyz, sfeat=sfeat, idx=idx, lvl=lvl, cen=cen):
            acc = 0.0
            for g, widths in zip(idx, lvl.mlps):
                gx = group_points(sxyz + i * 1e-6, g) - cen[:, :, None, :]
                pre = jax.random.normal(
                    jax.random.PRNGKey(0), (b, sxyz.shape[1], widths[0]))
                gp = group_points(pre + i * 1e-6, g)
                acc += jnp.sum(gx) + jnp.sum(gp)
            return acc
        time_op(f"gathers_L{li}", gathers)

        for sc, widths in enumerate(lvl.mlps):
            mlp = SharedMLP(widths, train=False, dtype=dtype)
            g = jax.random.normal(
                jax.random.fold_in(rng, 200 + li * 2 + sc),
                (b, lvl.npoint, lvl.nsamples[sc], 3))
            pre = jax.random.normal(
                jax.random.fold_in(rng, 300 + li * 2 + sc),
                (b, lvl.npoint, lvl.nsamples[sc], widths[0]))
            mvars = mlp.init(jax.random.PRNGKey(0), g)

            def mlp_fn(i, mlp=mlp, mvars=mvars, g=g, pre=pre):
                out = mlp.apply(mvars, (g + i * 1e-6).astype(dtype),
                                first_precomputed=(pre + i * 1e-6
                                                   ).astype(dtype))
                return jnp.sum(jnp.max(out, axis=2))
            time_op(f"sa_mlp_L{li}s{sc}", mlp_fn)

    # FP stages: fused 3-NN interp (precompute-first path) + skip MLP.
    from pvn3d_tpu.ops.pallas.interp import three_interpolate_fused
    for li, widths in enumerate(pcfg.fp_mlps):
        n_unk = level_n[li]
        n_kn = level_n[li + 1]
        c_known = (pcfg.fp_mlps[li + 1][-1] if li < len(pcfg.fp_mlps) - 1
                   else c_in[li + 1])
        unk = jax.random.normal(jax.random.fold_in(rng, 400 + li),
                                (b, n_unk, 3)) * 0.2
        kn = jax.random.normal(jax.random.fold_in(rng, 500 + li),
                               (b, n_kn, 3)) * 0.2
        pre = jax.random.normal(jax.random.fold_in(rng, 600 + li),
                                (b, n_kn, widths[0]))

        def interp_fn(i, unk=unk, kn=kn, pre=pre):
            out, _, _ = three_interpolate_fused(
                unk + i * 1e-6, kn, (pre + i * 1e-6).astype(jnp.float32),
                1e-8, jax.default_backend() != "tpu")
            return jnp.sum(out)
        time_op(f"fp_interp_L{li}", interp_fn)

        mlp = SharedMLP(widths, train=False, dtype=dtype)
        skip_c = 6 if li == 0 else c_in[li]
        skip = jax.random.normal(jax.random.fold_in(rng, 700 + li),
                                 (b, n_unk, skip_c))
        ipre = jax.random.normal(jax.random.fold_in(rng, 800 + li),
                                 (b, n_unk, widths[0]))
        cat = jnp.concatenate(
            [jax.random.normal(jax.random.fold_in(rng, 900 + li),
                               (b, n_unk, c_known)), skip], axis=-1)
        mvars = mlp.init(jax.random.PRNGKey(0), cat)

        def fp_mlp_fn(i, mlp=mlp, mvars=mvars, skip=skip, ipre=ipre,
                      c_known=c_known):
            out = mlp.apply(mvars, (skip + i * 1e-6).astype(dtype),
                            first_precomputed=(ipre + i * 1e-6
                                               ).astype(dtype),
                            x_offset=c_known)
            return jnp.sum(out)
        time_op(f"fp_mlp_L{li}", fp_mlp_fn)

    total = sum(results.values())
    print(json.dumps({"component_ms": results,
                      "sum_ms": round(total, 3),
                      "floor_ms": round(floor * 1e3, 3),
                      "iters": args.iters, "batch": b}))


if __name__ == "__main__":
    main()
