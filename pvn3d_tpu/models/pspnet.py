"""PSPNet image branch: pyramid scene parsing over the ResNet trunk.

Capability match for the reference's Modified_PSPNet
(pvn3d/lib/pspnet.py:7-90): 4-scale adaptive-pool pyramid (1/2/3/6) with 1x1
convs, bilinear re-upsampling, a 1024-d bottleneck, three 2x upsample stages
(bilinear align-corners + 3x3 conv + BN + PReLU) back to full resolution, a
128-d per-pixel embedding head and an auxiliary log-softmax seg head.  All
resizes/pools are static-matrix matmuls (see layers.py) — no gathers.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pvn3d_tpu.models.layers import (
    BatchNorm, PReLU, adaptive_avg_pool, resize_bilinear)
from pvn3d_tpu.models.resnet import DilatedResNet


class PSPModule(nn.Module):
    """Pyramid pooling: pool to s x s, 1x1 conv, resize back, concat,
    bottleneck to ``out_features`` (reference: pspnet.py:7-31)."""
    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        feats = x.shape[-1]
        priors = []
        for s in self.sizes:
            p = adaptive_avg_pool(x, s, s)
            p = nn.Conv(feats, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"stage{s}")(p)
            priors.append(resize_bilinear(p, h, w, align_corners=False))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = nn.Conv(self.out_features, (1, 1), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="bottleneck")(y)
        return nn.relu(y)


class PSPUpsample(nn.Module):
    """2x bilinear (align_corners) + 3x3 conv + BN + PReLU
    (reference: pspnet.py:34-45)."""
    features: int
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bn_momentum=0.1):
        h, w = x.shape[-3], x.shape[-2]
        x = resize_bilinear(x, 2 * h, 2 * w, align_corners=True)
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = BatchNorm(use_running_average=not self.train,
                      dtype=self.dtype)(x, bn_momentum)
        return PReLU()(x)


class PSPNetEmbedding(nn.Module):
    """Full image branch: trunk -> PSP -> 3x upsample -> (embedding, seg).

    Returns a (B, H, W, embedding_dim) per-pixel embedding and a
    (B, H, W, n_classes) log-softmax seg map (the latter is returned-but-
    unused in the reference loss, pvn3d.py:286; kept for API parity).
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

    @nn.compact
    def __call__(self, rgb, bn_momentum=0.1):
        x = DilatedResNet(layers=self.backbone_layers, train=self.train,
                          dtype=self.dtype, name="trunk")(rgb, bn_momentum)
        x = PSPModule(out_features=self.psp_out, sizes=self.sizes,
                      dtype=self.dtype, name="psp")(x)
        x = nn.Dropout(self.dropout_psp, deterministic=not self.train)(x)
        for i, ch in enumerate(self.up_channels):
            x = PSPUpsample(features=ch, train=self.train, dtype=self.dtype,
                            name=f"up{i + 1}")(x, bn_momentum)
            if i < len(self.up_channels) - 1:
                x = nn.Dropout(self.dropout_up,
                               deterministic=not self.train)(x)
        emb = nn.Conv(self.embedding_dim, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="final")(x)
        seg = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="final_seg")(x)
        seg = nn.log_softmax(seg.astype(jnp.float32), axis=-1)
        return emb, seg
