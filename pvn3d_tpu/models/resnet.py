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
import jax
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


def _stem_s2d(x, kernel, dtype):
    """The stem's 7x7/2 conv computed as a 4x4/1 conv on 2x2
    space-to-depth input — exactly the same multiply-adds.

    With ``i = 2a + di + 3`` (tap row i, s2d phase di in {0,1}, new tap
    row a in {-2..1}) each original tap lands at exactly one (a, di)
    slot, so ``K'[a+2, b+2, (di, dj, ch)] = K[i, j, ch]`` and

      y(r, c) = sum K[i, j, ch] x(2r + i - 3, 2c + j - 3, ch)
              = sum K'[a+2, b+2, (di, dj, ch)] X(r + a, c + b, (di, dj, ch))

    where ``X(R, C, (di, dj, ch)) = x(2R + di, 2C + dj, ch)``.  The new
    conv has padding (2, 1) per spatial dim (a ranges -2..1).
    """
    b, h, w, cin = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, cin)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // 2, w // 2, 4 * cin)
    kp = jnp.zeros((4, 4, 2, 2, cin, kernel.shape[-1]), kernel.dtype)
    for i in range(7):
        di = (i - 3) % 2
        a = (i - 3 - di) // 2
        for j in range(7):
            dj = (j - 3) % 2
            bb = (j - 3 - dj) // 2
            kp = kp.at[a + 2, bb + 2, di, dj].set(kernel[i, j])
    kp = kp.reshape(4, 4, 4 * cin, kernel.shape[-1])
    return jax.lax.conv_general_dilated(
        xs.astype(dtype), kp.astype(dtype), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class DilatedResNet(nn.Module):
    """ResNet-(18/34) with output stride 8 via dilation.

    Returns the stride-8, 512-channel feature map (the reference also
    returns the layer3 map for an unused classifier head; we don't).
    """
    layers: Sequence[int] = (3, 4, 6, 3)
    dilations: Sequence[int] = (1, 1, 1, 1)
    train: bool = True
    dtype: jnp.dtype = jnp.float32
    # Space-to-depth stem: the 7x7/2 conv over 3 input channels starves
    # the MXU (measured 3.1 TFLOP/s, 0.46 ms — the single most expensive
    # conv in the trunk).  Folding the stride into a 2x2 space-to-depth
    # makes it a 4x4/1 conv over 12 channels — the SAME function (kernel
    # taps regrouped by parity), ~4x the arithmetic intensity.  Applies
    # in train and eval (params keep the reference (7,7,3,64) layout; the
    # regroup is a constant-folded transform of the kernel).
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x, bn_momentum=0.1):
        stem = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                       use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv1")
        h, w = x.shape[1], x.shape[2]
        if (self.s2d_stem and not self.is_initializing()
                and h % 2 == 0 and w % 2 == 0):
            x = _stem_s2d(x, stem.variables["params"]["kernel"], self.dtype)
        else:
            x = stem(x)
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
