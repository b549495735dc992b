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


def fold2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (pi, pj, c)."""
    b, h, w, c = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // 2, w // 2, 4 * c)


def unfold2(y):
    """Inverse of :func:`fold2`."""
    b, hh, ww, c4 = y.shape
    c = c4 // 4
    ys = y.reshape(b, hh, ww, 2, 2, c)
    return jnp.transpose(ys, (0, 1, 3, 2, 4, 5)).reshape(
        b, 2 * hh, 2 * ww, c)


def _phase_kernel3(k):
    """Regroup a stride-1 3x3 kernel (3, 3, C, O) into the 2x2
    phase-folded space: (3, 3, 4C, 4O), channel order (pi, pj, c).

    With output phase pi and full-space tap oi, the tap row 2R+pi+oi
    lands in input phase qi = (pi+oi) mod 2 at phase-space offset
    ai = (pi+oi-qi)/2 in {-1, 0, 1} — each original tap fills exactly
    one (ai, qi) slot, so the folded conv (SAME pad 1) computes the
    SAME multiply-adds; 36 of the 144 (ai, aj, q, p) blocks are nonzero.
    The point: C=64 convs half-fill the 128-wide MXU lanes (layer1
    measured 27 TFLOP/s vs layer3/4 at ~180); folded, both operands are
    256 channels wide.  4x the issued MACs at ~6.7x the utilization.
    """
    cin, co = k.shape[2], k.shape[3]
    kp = jnp.zeros((3, 3, 2, 2, cin, 2, 2, co), k.dtype)
    for pi in range(2):
        for oi in range(3):
            s = pi + oi - 1
            qi, ai = s % 2, (s - s % 2) // 2
            for pj in range(2):
                for oj in range(3):
                    t = pj + oj - 1
                    qj, aj = t % 2, (t - t % 2) // 2
                    kp = kp.at[ai + 1, aj + 1, qi, qj, :, pi, pj, :].set(
                        k[oi, oj])
    return kp.reshape(3, 3, 4 * cin, 4 * co)


def _phase_entry_kernel3(k):
    """Regroup a stride-2 3x3 kernel (3, 3, C, O) for a 2x2 phase-folded
    INPUT and an UNFOLDED stride-2-resolution output: (2, 2, 4C, O).

    Output row r is full-space row 2r; tap 2r+oi lands in input phase
    qi = oi mod 2 at phase-space offset (oi - qi)/2 in {-1, 0} — a 2x2
    phase-space kernel with top/left-only padding (1, 0).  Same
    multiply-adds as the strided full-space conv.
    """
    cin, co = k.shape[2], k.shape[3]
    kp = jnp.zeros((2, 2, 2, 2, cin, co), k.dtype)    # (a, b, qi, qj, .)
    for oi in range(3):
        s = oi - 1
        qi, ai = s % 2, (s - s % 2) // 2
        for oj in range(3):
            t = oj - 1
            qj, aj = t % 2, (t - t % 2) // 2
            kp = kp.at[ai + 1, aj + 1, qi, qj].set(k[oi, oj])
    return kp.reshape(2, 2, 4 * cin, co)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    train: bool = True
    dtype: jnp.dtype = jnp.float32
    # Eval-only: input/output are 2x2 phase-folded (fold2) and the two
    # 3x3 convs run with _phase_kernel3-regrouped kernels — exactly the
    # same function (up to f32 summation order), full-lane channels.
    # Only valid for stride-1, dilation-1, no-downsample blocks.
    phase2: bool = False
    # Eval-only: input is phase-folded, this block is a stride-2 stage
    # entry (downsample proj) — conv1 consumes the folded tensor via
    # _phase_entry_kernel3 and the output comes out UNFOLDED at the
    # strided resolution; the 1x1/2 projection reads the (0,0) phase
    # channel slice.  Lets the fold persist across the layer1->layer2
    # boundary instead of unfolding just to re-stride.
    phase_in: bool = False

    @nn.compact
    def __call__(self, x, bn_momentum=0.1):
        conv1 = nn.Conv(self.planes, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=((self.dilation, self.dilation),
                                 (self.dilation, self.dilation)),
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv1")
        bn1 = BatchNorm(use_running_average=not self.train,
                        dtype=self.dtype, name="bn1")
        conv2 = nn.Conv(self.planes, (3, 3), strides=(1, 1),
                        padding=((self.dilation, self.dilation),
                                 (self.dilation, self.dilation)),
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv2")
        bn2 = BatchNorm(use_running_average=not self.train,
                        dtype=self.dtype, name="bn2")

        phase = (self.phase2 and not self.train
                 and not self.is_initializing())
        if phase:
            assert (self.stride == 1 and self.dilation == 1
                    and not self.downsample)

            def conv_p(inp, conv_mod):
                kp = _phase_kernel3(conv_mod.variables["params"]["kernel"])
                return jax.lax.conv_general_dilated(
                    inp.astype(self.dtype), kp.astype(self.dtype),
                    (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            def bn_p(inp, bn_mod):
                v = bn_mod.variables
                scale = jnp.tile(v["params"]["scale"], 4)
                bias = jnp.tile(v["params"]["bias"], 4)
                mean = jnp.tile(v["batch_stats"]["mean"], 4)
                var = jnp.tile(v["batch_stats"]["var"], 4)
                inv = jax.lax.rsqrt(var + bn_mod.epsilon) * scale
                out = (inp.astype(jnp.float32) - mean) * inv + bias
                return out.astype(self.dtype)

            y = nn.relu(bn_p(conv_p(x, conv1), bn1))
            y = bn_p(conv_p(y, conv2), bn2)
            return nn.relu(y + x)

        entry = (self.phase_in and not self.train
                 and not self.is_initializing())
        if entry:
            assert (self.stride == 2 and self.dilation == 1
                    and self.downsample)
            kp = _phase_entry_kernel3(conv1.variables["params"]["kernel"])
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kp.astype(self.dtype),
                (1, 1), [(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = bn1(y, bn_momentum)
            y = nn.relu(y)
            y = conv2(y)
            y = bn2(y, bn_momentum)
            # 1x1 stride-2 projection == 1x1 stride-1 on the (0, 0)
            # phase channel block (channels are (pi, pj, c)-major).
            cin = x.shape[-1] // 4
            down_conv = nn.Conv(self.planes, (1, 1), strides=(2, 2),
                                use_bias=False, dtype=self.dtype,
                                param_dtype=jnp.float32, name="down_conv")
            dk = down_conv.variables["params"]["kernel"]     # (1,1,C,O)
            residual = (x[..., :cin].astype(self.dtype)
                        @ dk[0, 0].astype(self.dtype))
            residual = BatchNorm(use_running_average=not self.train,
                                 dtype=self.dtype,
                                 name="down_bn")(residual, bn_momentum)
            return nn.relu(y + residual)

        y = conv1(x)
        y = bn1(y, bn_momentum)
        y = nn.relu(y)
        y = conv2(y)
        y = bn2(y, bn_momentum)
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
    # Eval-only phase-folded layer1: the C=64 3x3 convs at 120x160 run
    # half-lane on the MXU (measured 27 TFLOP/s vs ~180 for layers 3/4).
    # fold2 the stage input, run every block with _phase_kernel3-regrouped
    # 256-channel kernels, unfold2 at the stage exit — same multiply-adds
    # regrouped (BasicBlock.phase2).  Train keeps the reference graph
    # (phase-space BN batch stats would fold the 4 phases into one
    # channel's statistics).
    phase_layer1: bool = True

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
        folded = False
        for s, (planes, stride) in enumerate(stages):
            dilation = self.dilations[s]
            phase_stage = (s == 0 and self.phase_layer1 and not self.train
                           and not self.is_initializing()
                           and stride == 1 and dilation == 1
                           and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
            if phase_stage:
                x = fold2(x)
                folded = True
            # A folded tensor rides straight into a stride-2 stage entry
            # (the _phase_entry_kernel3 conv unfolds it for free); any
            # other follow-on stage shape unfolds explicitly.
            entry_here = (folded and not phase_stage and stride == 2
                          and dilation == 1)
            if folded and not phase_stage and not entry_here:
                x = unfold2(x)
                folded = False
            for b in range(self.layers[s]):
                first = b == 0
                x = BasicBlock(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=dilation,
                    downsample=first and (stride != 1 or in_planes != planes),
                    train=self.train, dtype=self.dtype,
                    phase2=phase_stage,
                    phase_in=entry_here and first,
                    name=f"layer{s + 1}_block{b}")(x, bn_momentum)
                if entry_here and first:
                    folded = False      # entry conv output is unfolded
            in_planes = planes
        if folded:
            x = unfold2(x)
        return x
