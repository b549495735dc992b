"""Shared NN building blocks (flax.linen, channels-last, bf16-friendly).

Replaces the reference's etw_pytorch_utils plumbing (SharedMLP / Conv wrappers
/ BNMomentumScheduler, pvn3d/lib/utils/etw_pytorch_utils/pytorch_utils.py) and
its 728-LoC vendored SyncBN (lib/utils/sync_batchnorm/).  Under GSPMD jit a
batch-sharded ``jnp.mean`` already computes *global* batch statistics — XLA
inserts the ICI all-reduce — so cross-replica BN needs no explicit machinery
here at all.

Design notes:
  * ``BatchNorm`` takes the (torch-convention) momentum as a *call argument*
    so the reference's BN-momentum schedule (train_ycb_pvn3d.py:477-484)
    becomes a scalar input of the jitted train step instead of a Python-side
    module rewrite.
  * ``resize_bilinear`` / ``adaptive_avg_pool`` are separable interpolations
    expressed as two small matmuls with precomputed static weight matrices —
    MXU work instead of gather soup.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BatchNorm(nn.Module):
    """Batch normalization with dynamic (torch-convention) momentum.

    running <- (1 - m) * running + m * batch   (torch semantics, so the
    reference's schedule values apply unchanged).  Stats are computed in f32
    regardless of compute dtype.  Under a data-sharded GSPMD program the
    reductions below are global across the mesh (SyncBN for free).
    """
    use_running_average: bool = False
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, momentum: jnp.ndarray | float = 0.1):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            # E[x^2]-E[x]^2 can round negative for large-mean/low-variance
            # channels; rsqrt would then be NaN (flax clamps identically).
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                # torch tracks the unbiased running var.
                n = np.prod([x.shape[i] for i in range(x.ndim - 1)])
                unbiased = var * (n / max(n - 1, 1))
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype if self.dtype else x.dtype)


class ConvBnRelu(nn.Module):
    """3x3/1x1 conv + BN + ReLU, torch-style explicit padding."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bn: bool = True
    use_relu: bool = True
    use_bias: bool = False
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bn_momentum=0.1):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        if self.use_bn:
            x = BatchNorm(use_running_average=not self.train,
                          dtype=self.dtype)(x, bn_momentum)
        if self.use_relu:
            x = nn.relu(x)
        return x


class SharedMLP(nn.Module):
    """Stack of per-point Dense + BN + ReLU on the trailing feature axis.

    Equivalent of the reference's SharedMLP (1x1 Conv2d + BN2d + ReLU stacks,
    etw_pytorch_utils/pytorch_utils.py:25-50) in channels-last layout: a
    Dense over the last axis of a (..., C) tensor is the same contraction,
    and XLA maps it straight onto the MXU.

    ``precompute_first`` / ``first_precomputed`` support the gather-after-
    matmul SA evaluation path: the first layer's input is a concat
    [xyz-ish part | gathered features], so Dense_0 splits as
    x_a @ K[:a] + feat @ K[a:]; the feature term can be computed per
    source point BEFORE the neighborhood gather (N rows instead of
    np*ns) and gathered in W_0 channels.  Exact up to one f32 add
    reassociation.
    """
    widths: Sequence[int]
    train: bool = True
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.denses = [nn.Dense(w, use_bias=not self.use_bn,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=f"Dense_{i}")
                       for i, w in enumerate(self.widths)]
        if self.use_bn:
            self.bns = [BatchNorm(use_running_average=not self.train,
                                  dtype=self.dtype, name=f"BatchNorm_{i}")
                        for i in range(len(self.widths))]

    def _tail(self, x, i, bn_momentum):
        if self.use_bn:
            x = self.bns[i](x, bn_momentum)
        return nn.relu(x)

    def __call__(self, x, bn_momentum=0.1, first_precomputed=None,
                 x_offset: int = 0):
        """``first_precomputed``: optional (..., widths[0]) tensor holding
        the already-contracted part of layer 0 (from
        :meth:`precompute_first` / :meth:`precompute_leading`); ``x`` then
        carries only the remaining input channels of layer 0, starting at
        channel ``x_offset`` of the full layer-0 input (0 when ``x`` is
        the leading block — the SA path; ``C_known`` when it is the
        trailing skip block — the FP path)."""
        for i in range(len(self.widths)):
            if i == 0 and first_precomputed is not None:
                k0 = self.denses[0].variables["params"]["kernel"]
                a = x.shape[-1]
                y = x.astype(self.dtype) @ k0[
                    x_offset:x_offset + a].astype(self.dtype)
                if not self.use_bn:
                    b0 = self.denses[0].variables["params"]["bias"]
                    y = y + b0.astype(self.dtype)
                x = y + first_precomputed.astype(self.dtype)
            else:
                x = self.denses[i](x)
            x = self._tail(x, i, bn_momentum)
        return x

    def precompute_first(self, feats, n_lead: int):
        """``feats @ K0[n_lead:]`` — the trailing-channel part of layer 0
        (params must already exist; init always runs the standard path)."""
        k0 = self.denses[0].variables["params"]["kernel"]
        return feats.astype(self.dtype) @ k0[n_lead:].astype(self.dtype)

    def precompute_leading(self, feats):
        """``feats @ K0[:feats.shape[-1]]`` — the leading-channel part of
        layer 0.  The FP restructure: layer-0's input is
        concat[interp(known), skip], and IDW interpolation commutes with
        the pointwise matmul, so ``Dense(interp(known)) ==
        interp(Dense(known))`` — computed on the m known rows instead of
        the n interpolated ones."""
        k0 = self.denses[0].variables["params"]["kernel"]
        return feats.astype(self.dtype) @ k0[
            :feats.shape[-1]].astype(self.dtype)


def _resize_matrix(src: int, dst: int, align_corners: bool) -> np.ndarray:
    """(dst, src) bilinear interpolation weights, torch semantics."""
    if dst == src:
        return np.eye(dst, dtype=np.float32)
    out = np.zeros((dst, src), np.float32)
    for i in range(dst):
        if align_corners:
            pos = i * (src - 1) / (dst - 1) if dst > 1 else 0.0
        else:
            pos = (i + 0.5) * src / dst - 0.5
        pos = min(max(pos, 0.0), src - 1)
        lo = int(np.floor(pos))
        hi = min(lo + 1, src - 1)
        frac = pos - lo
        out[i, lo] += 1.0 - frac
        out[i, hi] += frac
    return out


def _resize_taps(src: int, dst: int, align_corners: bool):
    """Per-output (lo, hi, frac) 2-tap coordinates, torch semantics."""
    lo = np.zeros(dst, np.int32)
    hi = np.zeros(dst, np.int32)
    fr = np.zeros(dst, np.float32)
    for i in range(dst):
        if align_corners:
            pos = i * (src - 1) / (dst - 1) if dst > 1 else 0.0
        else:
            pos = (i + 0.5) * src / dst - 0.5
        pos = min(max(pos, 0.0), src - 1)
        lo[i] = int(np.floor(pos))
        hi[i] = min(lo[i] + 1, src - 1)
        fr[i] = pos - lo[i]
    return lo, hi, fr


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = False,
                    method: str = "matmul") -> jnp.ndarray:
    """Separable bilinear resize of (..., H, W, C).

    ``method``:
      * "matmul" — two static-weight matmuls (MXU work; the dense
        (out, src) matrix is mostly 2-tap zeros but maps perfectly onto
        the systolic array).
      * "lerp" — two static 2-tap gather+lerp passes: O(out) memory
        traffic instead of O(out*src) MXU work.  Same weights, same
        result (each matrix row has exactly the two lerp taps).
      * "matmul_packed" — the matmul form with spatial pairs packed into
        the channel (lane) dimension, for C below a full 128-lane tile
        (the PSP upsample stages run at C=64 = half a tile, so the plain
        einsums waste half the MXU lanes).  The H-pass packs W-pairs via
        a free reshape; the W-pass packs H-pairs (one transpose each
        way).  Bit-identical to "matmul": packing only relabels which
        lane carries which (spatial, channel) pair — every output is
        the same 2-nonzero-tap dot product, and folding exact zeros
        into an f32 accumulation in any order is exact.

    All three methods produce bit-identical results; they differ only in
    how the work maps onto the TPU (MXU lanes vs VPU gathers).
    """
    h, w = x.shape[-3], x.shape[-2]
    if method == "lerp":
        lo_h, hi_h, f_h = _resize_taps(h, out_h, align_corners)
        lo_w, hi_w, f_w = _resize_taps(w, out_w, align_corners)
        fh = jnp.asarray(f_h, x.dtype)[:, None, None]
        x = (jnp.take(x, jnp.asarray(lo_h), axis=-3) * (1 - fh)
             + jnp.take(x, jnp.asarray(hi_h), axis=-3) * fh)
        fw = jnp.asarray(f_w, x.dtype)[:, None]
        return (jnp.take(x, jnp.asarray(lo_w), axis=-2) * (1 - fw)
                + jnp.take(x, jnp.asarray(hi_w), axis=-2) * fw)
    wh = jnp.asarray(_resize_matrix(h, out_h, align_corners), x.dtype)
    ww = jnp.asarray(_resize_matrix(w, out_w, align_corners), x.dtype)
    if method == "matmul_packed":
        lead, c = x.shape[:-3], x.shape[-1]
        if w % 2 == 0:
            # H-pass with W-pairs packed into lanes: (w, c) -> (w/2, 2c)
            # is the identity on the flat buffer (free reshape).
            xp = x.reshape(*lead, h, w // 2, 2 * c)
            x = jnp.einsum("oh,...hpc->...opc", wh, xp).reshape(
                *lead, out_h, w, c)
        else:
            x = jnp.einsum("oh,...hwc->...owc", wh, x)
        if out_h % 2 == 0:
            # W-pass with H-pairs packed into lanes (transpose each way).
            xp = x.reshape(*lead, out_h // 2, 2, w, c)
            xp = jnp.swapaxes(xp, -3, -2).reshape(
                *lead, out_h // 2, w, 2 * c)
            xp = jnp.einsum("ow,...pwc->...poc", ww, xp)
            xp = xp.reshape(*lead, out_h // 2, out_w, 2, c)
            return jnp.swapaxes(xp, -2, -3).reshape(
                *lead, out_h, out_w, c)
        return jnp.einsum("ow,...hwc->...hoc", ww, x)
    if method != "matmul":
        raise ValueError(f"unknown resize method {method!r} "
                         "(matmul / lerp / matmul_packed)")
    x = jnp.einsum("oh,...hwc->...owc", wh, x)
    return jnp.einsum("ow,...hwc->...hoc", ww, x)


def shifted_resize_matrix(src: int, dst: int,
                          align_corners: bool) -> np.ndarray:
    """(dst, 3*src) stacked bilinear matrices for resize-into-conv fusion.

    Column block ``i`` (i in 0..2, conv-tap index) holds the resize matrix
    with its rows shifted by ``i - 1``: ``out[r, i*src + j] =
    R[r + i - 1, j]`` where ``R`` is the plain (dst, src) bilinear matrix
    and rows outside ``[0, dst)`` are zero (the conv's zero padding on the
    resized map).  Applying this to tap-contracted features computes
    ``sum_i shift_{i-1}(resize(z_i))`` in one matmul — see
    ``PSPUpsample.fused`` (models/pspnet.py).
    """
    r = _resize_matrix(src, dst, align_corners)
    out = np.zeros((dst, 3 * src), np.float32)
    for i in range(3):
        d = i - 1
        lo = max(0, -d)
        hi = min(dst, dst - d)
        out[lo:hi, i * src:(i + 1) * src] = r[lo + d:hi + d]
    return out


def _adaptive_pool_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) averaging weights with torch AdaptiveAvgPool2d binning."""
    out = np.zeros((dst, src), np.float32)
    for i in range(dst):
        lo = (i * src) // dst
        hi = -((-(i + 1) * src) // dst)  # ceil
        out[i, lo:hi] = 1.0 / (hi - lo)
    return out


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Adaptive average pooling of (..., H, W, C) as two static matmuls."""
    h, w = x.shape[-3], x.shape[-2]
    wh = jnp.asarray(_adaptive_pool_matrix(h, out_h), x.dtype)
    ww = jnp.asarray(_adaptive_pool_matrix(w, out_w), x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", wh, x)
    return jnp.einsum("ow,...hwc->...hoc", ww, x)


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 max pool with pad 1 (resnet stem, extractors.py:130)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


class PReLU(nn.Module):
    """Parametric ReLU with torch's init (0.25) and single shared slope."""
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,),
                       jnp.float32)
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)
