"""Stride-8 ResNet-34 trunk for the PSP image branch (flax.linen, NHWC).

Capability match for the reference's extractor (pvn3d/lib/extractors.py:
108-224): output stride 8 — layers 1/2 stride 1/2, layers 3/4 stride 1.
Note a reference quirk: extractors.py:134-135 *passes* dilation=2/4 to
``_make_layer``, but that argument is dead code (the body only reads
``self.current_dilation``, which never changes because ``output_stride``
defaults to 32) — so the network the paper trained has NO dilation, just
stride-1 tail stages.  We reproduce that default and expose ``dilations``
as a knob for the properly-dilated variant.  Built bf16-first: convs run in
the configured compute dtype, BN stats in f32.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pvn3d_tpu.models.layers import BatchNorm, max_pool_3x3_s2


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bn_momentum=0.1):
        pad = self.dilation
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="bn1")(y, bn_momentum)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(1, 1),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="bn2")(y, bn_momentum)
        residual = x
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name="down_conv")(x)
            residual = BatchNorm(use_running_average=not self.train,
                                 dtype=self.dtype,
                                 name="down_bn")(residual, bn_momentum)
        return nn.relu(y + residual)


class DilatedResNet(nn.Module):
    """ResNet-(18/34) with output stride 8 via dilation.

    Returns the stride-8, 512-channel feature map (the reference also
    returns the layer3 map for an unused classifier head; we don't).
    """
    layers: Sequence[int] = (3, 4, 6, 3)
    dilations: Sequence[int] = (1, 1, 1, 1)
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bn_momentum=0.1):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="bn1")(x, bn_momentum)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        # (planes, stride) per stage; stride-8 tail (strides 1 in 3/4).
        stages = [(64, 1), (128, 2), (256, 1), (512, 1)]
        in_planes = 64
        for s, (planes, stride) in enumerate(stages):
            dilation = self.dilations[s]
            for b in range(self.layers[s]):
                first = b == 0
                x = BasicBlock(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=dilation,
                    downsample=first and (stride != 1 or in_planes != planes),
                    train=self.train, dtype=self.dtype,
                    name=f"layer{s + 1}_block{b}")(x, bn_momentum)
            in_planes = planes
        return x
