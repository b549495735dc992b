"""FP-stage microbench: fused Pallas 3-NN+IDW kernel vs the XLA path.

Levels mirror the FP ladder of the YCB config (config.py:149-163): the
bottom level (n=12288, m=2048, C=256) materializes the trunk's largest
HBM intermediate on the XLA path.  Run on the real chip:
  python -m benchmarks.fp_bench [--iters 50]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.ops.interpolate import (idw_weights, three_interpolate,
                                       three_nn)
from pvn3d_tpu.ops.pallas.interp import three_interpolate_fused
from pvn3d_tpu.utils import cache
from pvn3d_tpu.utils.profiling import device_loop_time

# (n unknown, m known, C feature width) per FP level, bottom first.
LEVELS = [(12288, 2048, 256), (2048, 1024, 512), (1024, 512, 512),
          (512, 128, 1024)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1)
    from pvn3d_tpu.utils.platform import (add_platform_args,
                                           apply_platform)
    add_platform_args(ap)
    args = ap.parse_args()
    apply_platform(args)
    cache.enable_compilation_cache()
    rng = np.random.RandomState(0)

    for n, m, c in LEVELS:
        u = jnp.asarray(rng.randn(args.batch, n, 3).astype(np.float32) * .3)
        k = u[:, :m] + 0.01
        f = jnp.asarray(rng.randn(args.batch, m, c).astype(np.float32))

        # Salt the known side + features too: loop-invariant k/f let
        # XLA hoist the XLA path's m-row precomputations (k_sq etc.) out
        # of the timed scan while the fused pallas_call must recompute
        # everything — an unfair comparison.
        def xla_step(i, mode):
            dist, idx = three_nn(u + i * 1e-6, k + i * 1e-6, mode=mode)
            out = three_interpolate(f + i * 1e-6, idx, idw_weights(dist))
            return jnp.sum(out)

        def fused_step(i):
            out, _, _ = three_interpolate_fused(u + i * 1e-6, k + i * 1e-6,
                                                f + i * 1e-6)
            return jnp.sum(out)

        t_fused = device_loop_time(fused_step, args.iters) * 1e3
        t_apx = device_loop_time(lambda i: xla_step(i, "approx"),
                                 args.iters) * 1e3
        t_ex = device_loop_time(lambda i: xla_step(i, "exact"),
                                args.iters) * 1e3
        print(f"n={n:>5} m={m:>4} C={c:>4}: fused {t_fused:7.3f} ms  "
              f"xla-approx {t_apx:7.3f} ms  xla-exact {t_ex:7.3f} ms  "
              f"speedup {t_apx / t_fused:4.1f}x", flush=True)


if __name__ == "__main__":
    main()
