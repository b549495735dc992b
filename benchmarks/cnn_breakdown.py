"""Per-module timing of the CNN branch on the chip.

The full CNN stage reads ~5.4 ms (stage_breakdown) for ~224 GFLOP of
trunk convs — ~20% MXU utilization at v5e bf16 peak, so there is real
headroom.  This bench localizes it: trunk (DilatedResNet), PSP module,
each PSPUpsample stage (dense), and the sparse tail, each as its own
jitted program on realistic shapes (480x640 YCB frame).

  python -m benchmarks.cnn_breakdown [--iters 50]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from pvn3d_tpu.config import Config
from pvn3d_tpu.models.pspnet import PSPModule, PSPUpsample
from pvn3d_tpu.models.resnet import BasicBlock, DilatedResNet
from pvn3d_tpu.utils import cache
from pvn3d_tpu.utils.profiling import device_loop_time


class _Stage(nn.Module):
    """One ResNet stage in isolation (same shapes/params as in the trunk)."""
    planes: int
    n_blocks: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for b in range(self.n_blocks):
            first = b == 0
            x = BasicBlock(
                planes=self.planes, stride=self.stride if first else 1,
                downsample=first and (self.stride != 1
                                      or x.shape[-1] != self.planes),
                train=False, dtype=self.dtype, name=f"block{b}")(x)
        return x


def _time_module(mod, x, iters, method=None, extra=(), init_extra=None):
    # Init always runs the standard __call__ (restructured methods like
    # PSPUpsample.fused read params and cannot create them).
    init_extra = extra if init_extra is None else init_extra
    variables = jax.jit(
        lambda k: mod.init(k, x, *init_extra))(jax.random.PRNGKey(0))

    @jax.jit
    def step(i):
        # Salt the input so the tunnel cannot memoize the dispatch.
        y = mod.apply(variables, x + i * 1e-6, *extra, method=method)
        return sum(jnp.sum(l).astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(y))

    return device_loop_time(step, iters)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    from pvn3d_tpu.utils.platform import add_platform_args, apply_platform
    add_platform_args(ap)
    args = ap.parse_args()
    apply_platform(args)
    cache.enable_compilation_cache()

    cfg = Config().model.cnn
    h, w = args.height, args.width
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    out = {}

    rgb = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    trunk = DilatedResNet(layers=cfg.backbone_layers, train=False,
                          dtype=dtype)
    out["trunk"] = _time_module(trunk, rgb, args.iters)

    # Per-stage trunk decomposition (stride-8 tail: layers 3/4 at h/8).
    nb = cfg.backbone_layers
    stage_shapes = [
        ("trunk_layer1", 64, nb[0], 1, (1, h // 4, w // 4, 64)),
        ("trunk_layer2", 128, nb[1], 2, (1, h // 4, w // 4, 64)),
        ("trunk_layer3", 256, nb[2], 1, (1, h // 8, w // 8, 128)),
        ("trunk_layer4", 512, nb[3], 1, (1, h // 8, w // 8, 256)),
    ]
    for name, planes, blocks, stride, shape in stage_shapes:
        xs = jnp.asarray(rng.rand(*shape).astype(np.float32))
        out[name] = _time_module(
            _Stage(planes=planes, n_blocks=blocks, stride=stride,
                   dtype=dtype), xs, args.iters)

    f8 = jnp.asarray(rng.rand(1, h // 8, w // 8, 512).astype(np.float32))
    psp = PSPModule(out_features=cfg.psp_out, sizes=cfg.psp_sizes,
                    dtype=dtype, resize_method=cfg.resize_method)
    out["psp"] = _time_module(psp, f8, args.iters)

    c_in = cfg.psp_out
    for i, ch in enumerate(cfg.up_channels):
        scale = 8 >> i                       # input resolution of stage i
        x = jnp.asarray(rng.rand(
            1, h // scale, w // scale, c_in).astype(np.float32))
        up = PSPUpsample(features=ch, train=False, dtype=dtype,
                         resize_method=cfg.resize_method)
        out[f"up{i + 1}_dense"] = _time_module(up, x, args.iters)
        out[f"up{i + 1}_fused"] = _time_module(
            up, x, args.iters, method=PSPUpsample.fused)
        if i == len(cfg.up_channels) - 1:
            # Sparse twin of the last stage at 12288 sampled pixels.
            pix = jnp.asarray(
                rng.randint(0, h * w, (1, 12288)).astype(np.int32))
            rows = (pix // w).astype(jnp.int32)
            cols = (pix % w).astype(jnp.int32)
            out["up_last_sparse"] = _time_module(
                up, x, args.iters, method=PSPUpsample.sparse,
                extra=(rows, cols), init_extra=())
        c_in = ch

    ms = {k: round(v * 1e3, 3) for k, v in out.items()}
    dense_total = sum(v for k, v in ms.items()
                      if k != "up_last_sparse" and not k.endswith("_fused")
                      and not k.startswith("trunk_layer"))
    print(json.dumps({"stage_ms": ms,
                      "dense_total_ms": round(dense_total, 3),
                      "iters": args.iters}))


if __name__ == "__main__":
    main()
