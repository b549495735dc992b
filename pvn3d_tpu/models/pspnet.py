"""PSPNet image branch: pyramid scene parsing over the ResNet trunk.

Capability match for the reference's Modified_PSPNet
(pvn3d/lib/pspnet.py:7-90): 4-scale adaptive-pool pyramid (1/2/3/6) with 1x1
convs, bilinear re-upsampling, a 1024-d bottleneck, three 2x upsample stages
(bilinear align-corners + 3x3 conv + BN + PReLU) back to full resolution, a
128-d per-pixel embedding head and an auxiliary log-softmax seg head.  All
resizes/pools are static-matrix matmuls (see layers.py) — no gathers.

TPU-native sparse tail: the fusion stage only ever reads the embeddings of
the ~12288 sampled pixels (4% of 480x640), so at inference the last
upsample stage + the 1x1 heads can run at exactly those pixels — bilinear
patch sampling + the same conv params — instead of densely (the dense and
sparse paths share parameters; see ``PSPUpsample.sparse`` /
``PSPNetEmbedding.__call__(choose=...)``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pvn3d_tpu.models.layers import (
    BatchNorm, PReLU, adaptive_avg_pool, resize_bilinear,
    shifted_resize_matrix)
from pvn3d_tpu.models.resnet import DilatedResNet


class PSPModule(nn.Module):
    """Pyramid pooling: pool to s x s, 1x1 conv, resize back, concat,
    bottleneck to ``out_features`` (reference: pspnet.py:7-31)."""
    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.float32
    resize_method: str = "matmul"

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        feats = x.shape[-1]
        priors = []
        for s in self.sizes:
            p = adaptive_avg_pool(x, s, s)
            p = nn.Conv(feats, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"stage{s}")(p)
            priors.append(resize_bilinear(p, h, w, align_corners=False,
                                          method=self.resize_method))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = nn.Conv(self.out_features, (1, 1), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="bottleneck")(y)
        return nn.relu(y)


def _align_corners_coords(dst_idx, src_size: int, dst_size: int):
    """Fractional source coords of integer dest positions, torch
    align_corners=True convention."""
    scale = (src_size - 1) / max(dst_size - 1, 1)
    return dst_idx.astype(jnp.float32) * scale


class PSPUpsample(nn.Module):
    """2x bilinear (align_corners) + 3x3 conv + BN + PReLU
    (reference: pspnet.py:34-45).  ``sparse`` evaluates the SAME stage
    (same params) at arbitrary output pixels only."""
    features: int
    train: bool = True
    dtype: jnp.dtype = jnp.float32
    resize_method: str = "matmul"

    def setup(self):
        # VALID padding + explicit zero-pad in the dense path (identical
        # numbers): the sparse path then gets exactly the center output
        # of each reconstructed 3x3 patch instead of computing all nine
        # conv positions and keeping [1, 1] (9x the matmul FLOPs).
        self.conv = nn.Conv(self.features, (3, 3),
                            padding="VALID", use_bias=True,
                            dtype=self.dtype, param_dtype=jnp.float32)
        self.bn = BatchNorm(use_running_average=not self.train,
                            dtype=self.dtype)
        self.prelu = PReLU()

    def __call__(self, x, bn_momentum=0.1):
        h, w = x.shape[-3], x.shape[-2]
        x = resize_bilinear(x, 2 * h, 2 * w, align_corners=True,
                            method=self.resize_method)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = self.conv(x)
        x = self.bn(x, bn_momentum)
        return self.prelu(x)

    def fused(self, x, bn_momentum=0.1):
        """Dense output via resize-into-conv fusion (same params/function).

        ``conv3x3(pad(resize2x(x)))`` restructured so the channel
        contraction runs at LOW resolution: with ``z_ij = x @ W[i, j]``
        (the 9 conv taps as one (C_in, 9*C_out) matmul — 1/4 of the
        high-res conv FLOPs) and the resize being the separable linear map
        ``R_h x R_w^T``, the conv output is

            y[r, c] = sum_ij (R_h z_ij R_w^T)[r + i - 1, c + j - 1]

        with out-of-range rows/cols contributing zero (the conv's pad).
        Both spatial sums fold into single matmuls against the stacked
        shifted matrices of ``layers.shifted_resize_matrix``.  Equal to
        ``__call__`` up to f32/bf16 summation-order rounding
        (tests/test_models.py); eval-mode restructure — train keeps the
        reference graph.
        """
        b, h, w, cin = x.shape
        kernel = self.conv.variables["params"]["kernel"]   # (3, 3, Cin, Co)
        bias = self.conv.variables["params"]["bias"]
        co = kernel.shape[-1]
        k = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(cin, 9 * co)
        z = (x.astype(self.dtype) @ k.astype(self.dtype)).reshape(
            b, h, w, 3, 3, co)
        rh3 = jnp.asarray(shifted_resize_matrix(h, 2 * h, True), self.dtype)
        rw3 = jnp.asarray(shifted_resize_matrix(w, 2 * w, True), self.dtype)
        # H pass over the (tap-i, h) stacked axis.
        z = jnp.transpose(z, (0, 3, 1, 2, 4, 5)).reshape(b, 3 * h, w, 3, co)
        t = jnp.einsum("rk,bkwjo->brwjo", rh3, z)
        # W pass over the (tap-j, w) stacked axis.
        t = jnp.transpose(t, (0, 1, 3, 2, 4)).reshape(b, 2 * h, 3 * w, co)
        y = jnp.einsum("cl,brlo->brco", rw3, t)
        y = y + bias.astype(self.dtype)
        y = self.bn(y, bn_momentum)
        return self.prelu(y)

    def sparse(self, x, rows, cols, bn_momentum=0.1):
        """Evaluate at output pixels (rows, cols): (B, H, W, C), (B, P) ->
        (B, P, features).  The 3x3 conv input patch is reconstructed by
        bilinear-sampling the (2H, 2W) virtual upsampled map; positions
        outside it contribute zeros (the conv's zero padding).

        Gather plan (round 5 — the tap-by-tap form cost 36 gathers/pixel
        and was gather-bound at 0.94 ms): the 9 taps' 2x2 bilinear
        corners all live inside ONE 3x3 source patch anchored at the
        dr=-1 tap's floor coordinate — consecutive taps advance the
        fractional source coordinate by 2*(h-1)/(2h-1) < 1, so floors
        differ by at most 1, and the +1 lerp partners stay within index
        2 (clipping folds the h-1 edge into the same patch rows).  So:
        9 gathers for the patch, then per-tap corners are 2-way selects
        on the (0/1) floor offsets.  Bit-identical inputs to the same
        lerp expression as before."""
        b, h, w, c = x.shape
        oh, ow = 2 * h, 2 * w
        flat = x.reshape(b, h * w, c)

        def axis_info(base, d, src, dst):
            t = base + d
            inside = (t >= 0) & (t < dst)
            f = _align_corners_coords(jnp.clip(t, 0, dst - 1), src, dst)
            i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, src - 1)
            return inside, f, i0

        r_info = [axis_info(rows, d, h, oh) for d in (-1, 0, 1)]
        c_info = [axis_info(cols, d, w, ow) for d in (-1, 0, 1)]
        row0 = r_info[0][2]                       # smallest floor (B, P)
        col0 = c_info[0][2]
        pr = [jnp.minimum(row0 + k, h - 1) for k in range(3)]
        pc = [jnp.minimum(col0 + l, w - 1) for l in range(3)]
        # (B, P, 3, 3, C) source patch — 9 gathers total.
        patch = jnp.stack([
            jnp.stack([jnp.take_along_axis(
                flat, (pr[k] * w + pc[l])[..., None], axis=1)
                for l in range(3)], axis=2)
            for k in range(3)], axis=2)

        def corner(i, j, offr, offc):
            # patch[offr + i, offc + j] with offr/offc in {0, 1}.
            a = jnp.where(offc[..., None] == 0, patch[:, :, i, j],
                          patch[:, :, i, j + 1])
            bb = jnp.where(offc[..., None] == 0, patch[:, :, i + 1, j],
                           patch[:, :, i + 1, j + 1])
            return jnp.where(offr[..., None] == 0, a, bb)

        taps = []
        for (rin, rf, r0) in r_info:
            offr = r0 - row0
            rfr = (rf - r0.astype(jnp.float32)).astype(x.dtype)[..., None]
            for (cin_, cf, c0) in c_info:
                offc = c0 - col0
                cfr = (cf - c0.astype(jnp.float32)
                       ).astype(x.dtype)[..., None]
                top = (corner(0, 0, offr, offc) * (1 - cfr)
                       + corner(0, 1, offr, offc) * cfr)
                bot = (corner(1, 0, offr, offc) * (1 - cfr)
                       + corner(1, 1, offr, offc) * cfr)
                v = top * (1 - rfr) + bot * rfr
                inside = rin & cin_
                taps.append(jnp.where(inside[..., None], v, 0))
        patch9 = jnp.stack(taps, axis=2)                 # (B, P, 9, C)
        p = patch9.shape[1]
        patch9 = patch9.reshape(b * p, 3, 3, c)
        # VALID conv on a 3x3 patch == the center output pixel only.
        y = self.conv(patch9)[:, 0, 0, :].reshape(b, p, self.features)
        y = self.bn(y, bn_momentum)
        return self.prelu(y)


class PSPNetEmbedding(nn.Module):
    """Full image branch: trunk -> PSP -> 3x upsample -> (embedding, seg).

    Dense mode returns a (B, H, W, embedding_dim) per-pixel embedding and a
    (B, H, W, n_classes) log-softmax seg map (the latter is returned-but-
    unused in the reference loss, pvn3d.py:286; kept for API parity).
    With ``choose`` (B, P) flat full-res pixel indices, the final upsample
    stage and heads run sparsely and the result is (B, P, embedding_dim)
    with seg=None.
    """
    n_classes: int = 22
    sizes: Sequence[int] = (1, 2, 3, 6)
    psp_out: int = 1024
    up_channels: Sequence[int] = (256, 64, 64)
    embedding_dim: int = 128
    dropout_psp: float = 0.3
    dropout_up: float = 0.15
    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    train: bool = True
    dtype: jnp.dtype = jnp.float32
    # Bilinear-resize realization for the pyramid/upsample stages:
    # "matmul" (static-matrix MXU form) or "lerp" (2-tap gather form);
    # bit-equivalent, layers.py::resize_bilinear.
    resize_method: str = "matmul"
    # Eval-mode restructure: run the dense upsample stages through
    # PSPUpsample.fused (resize folded around the conv-tap matmul — the
    # channel contraction happens at low resolution, 1/4 the conv FLOPs).
    # Same parameters; equal up to summation-order rounding.
    fuse_up: bool = False

    def setup(self):
        self.trunk = DilatedResNet(layers=self.backbone_layers,
                                   train=self.train, dtype=self.dtype)
        self.psp = PSPModule(out_features=self.psp_out, sizes=self.sizes,
                             dtype=self.dtype,
                             resize_method=self.resize_method)
        self.drop_psp = nn.Dropout(self.dropout_psp,
                                   deterministic=not self.train)
        self.ups = [PSPUpsample(features=ch, train=self.train,
                                dtype=self.dtype,
                                resize_method=self.resize_method,
                                name=f"up{i + 1}")
                    for i, ch in enumerate(self.up_channels)]
        self.drop_ups = [nn.Dropout(self.dropout_up,
                                    deterministic=not self.train)
                         for _ in range(len(self.up_channels) - 1)]
        self.final = nn.Conv(self.embedding_dim, (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32)
        self.final_seg = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype,
                                 param_dtype=jnp.float32)

    def __call__(self, rgb, bn_momentum=0.1,
                 choose: Optional[jnp.ndarray] = None):
        x = self.trunk(rgb, bn_momentum)
        x = self.psp(x)
        x = self.drop_psp(x)
        n_up = len(self.ups)
        # Param trees are created by the standard path; the fused
        # restructure only ever runs on already-initialized params.
        fuse = self.fuse_up and not self.train and not self.is_initializing()
        for i in range(n_up - 1):
            x = (self.ups[i].fused(x, bn_momentum) if fuse
                 else self.ups[i](x, bn_momentum))
            x = self.drop_ups[i](x)

        if choose is None:
            # The LAST stage is never fused: at full output resolution with
            # C_in = C_out = 64 the stacked resize matmuls cost more than
            # the conv they absorb (measured 1.79 vs 1.29 ms on v5-lite,
            # benchmarks/cnn_breakdown.py); the win lives in the deep
            # stages where the channel contraction dominates.
            x = self.ups[-1](x, bn_momentum)
            emb = self.final(x)
            seg = self.final_seg(x)
            seg = nn.log_softmax(seg.astype(jnp.float32), axis=-1)
            return emb, seg

        # Sparse tail at the chosen full-resolution pixels only.
        out_w = x.shape[-2] * 2
        rows = (choose // out_w).astype(jnp.int32)
        cols = (choose % out_w).astype(jnp.int32)
        pts = self.ups[-1].sparse(x, rows, cols, bn_momentum)  # (B, P, C)
        b, p, c = pts.shape
        pts4 = pts.reshape(b, p, 1, c)
        emb = self.final(pts4)[:, :, 0, :]
        # final_seg runs here too — its output is unused downstream (the
        # reference computes-and-ignores it, pvn3d.py:286), but applying it
        # keeps the eval-mode variable tree identical to the train/dense
        # tree, so checkpoints and the torch converter load into either.
        seg = self.final_seg(pts4)[:, :, 0, :]
        seg = nn.log_softmax(seg.astype(jnp.float32), axis=-1)
        return emb, seg
