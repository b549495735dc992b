"""On-chip correctness audit of the fused pallas ball query.

The property tests (tests/test_pallas.py) run the kernel in INTERPRET
mode on CPU; this script runs the REAL compiled kernel on the current
backend and checks the kernel contract directly:

  * every selected index is in-radius, or equals the first-hit filler,
    or is 0 on no-hit centroids;
  * neighbor-set recall vs the exact first-ns reference subsample
    (informational — the reference's "first ns" is itself an arbitrary
    subsample, so <1.0 recall with 100%% in-radius validity is a
    legitimately different subsample, not an error).

Levels mirror PointNet2Config.sa_levels like benchmarks/query_bench.py.

  python -m benchmarks.query_validate [--capacity 2]
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from pvn3d_tpu.config import Config
from pvn3d_tpu.ops.grouping import ball_query_multi
from pvn3d_tpu.ops.pallas.query import ball_query_pallas
from pvn3d_tpu.utils import cache
from benchmarks.query_bench import synth_cloud


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--capacity", type=int, default=2)
    from pvn3d_tpu.utils.platform import add_platform_args, apply_platform
    add_platform_args(ap)
    args = ap.parse_args()
    apply_platform(args)
    cache.enable_compilation_cache()
    import jax.numpy as jnp

    cfg = Config()
    pn2 = cfg.model.pointnet2
    ns_in = [cfg.model.n_sample_points] + [
        l.npoint for l in pn2.sa_levels[:-1]]
    ok_all = True
    for li, (lvl, n_in) in enumerate(zip(pn2.sa_levels, ns_in)):
        pts = synth_cloud(n_in)[None]
        xyz = jnp.asarray(pts)
        cen = xyz[:, : lvl.npoint]
        pal = ball_query_pallas(lvl.radii, lvl.nsamples, xyz, cen,
                                capacity=args.capacity,
                                interpret=jax.default_backend() != "tpu")
        exact = ball_query_multi(lvl.radii, lvl.nsamples, xyz, cen,
                                 mode="exact")
        for si, (radius, p, e) in enumerate(zip(lvl.radii, pal, exact)):
            p = np.asarray(p[0])
            e = np.asarray(e[0])
            d2 = np.sum((pts[0][p] - pts[0][: lvl.npoint, None]) ** 2, -1)
            # Boundary epsilon: the kernel computes d2 in the expanded
            # c^2-2cx+x^2 f32 form (MXU-friendly), whose cancellation can
            # move the radius boundary by ~1e-6 for unit-scale clouds —
            # the same convention as the XLA approx path.  A point inside
            # r^2+eps is a boundary case, not a violation.
            in_r = d2 < radius * radius + 1e-5
            has_hit = in_r[:, 0]  # slot 0 is the filler source
            # no-hit centroids must be all-zero index rows
            nohit_ok = np.all(p[~has_hit] == 0)
            # hit centroids: every slot in-radius OR the first-hit filler
            filler = p[:, :1]
            valid = in_r | (p == filler)
            row_ok = np.all(valid[has_hit])
            frac = float(np.mean(in_r[has_hit]))
            recall = np.mean([
                len(set(p[i]) & set(e[i])) / max(len(set(e[i])), 1)
                for i in range(0, e.shape[0], 7)])
            status = "OK" if (row_ok and nohit_ok) else "VIOLATION"
            ok_all &= row_ok and nohit_ok
            print(f"L{li} scale{si} r={radius}: in_radius_frac={frac:.4f} "
                  f"first_ns_recall={recall:.4f} nohit_ok={nohit_ok} "
                  f"slots_valid={row_ok} -> {status}", flush=True)
    print("PASS" if ok_all else "FAIL", flush=True)
    raise SystemExit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
