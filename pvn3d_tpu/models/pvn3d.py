"""The full PVN3D-class model: CNN + PointNet++ + DenseFusion + 3 heads.

Capability match for the reference's PVN3D (pvn3d/lib/pvn3d.py:210-310):
  * image branch -> per-pixel 128-d embeddings, gathered at the ``choose``
    pixel of every sampled 3-D point;
  * point branch -> per-point 128-d embeddings from xyz+rgb+normal;
  * DenseFusion (pvn3d.py:157-182): per-point concat + per-modality lift +
    global pooled context = 1792-d fused features;
  * three per-point heads: semantic seg, keypoint offsets, center offset.

Everything is channels-last; heads are Dense stacks on the trailing axis.
Outputs (matching reference shapes at pvn3d.py:299-309):
  seg_logits (B, N, n_classes), kp_offsets (B, n_kps, N, 3),
  ctr_offsets (B, 1, N, 3).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pvn3d_tpu.config import ModelConfig
from pvn3d_tpu.models.layers import BatchNorm
from pvn3d_tpu.models.pointnet2 import PointNet2MSG
from pvn3d_tpu.models.pspnet import PSPNetEmbedding


class DenseFusion(nn.Module):
    """Per-point RGB-D feature fusion (reference: pvn3d.py:157-182).

    ``split_global=True`` returns ``(local, global)`` — the (B, N, 768)
    per-point half and the (B, 1, 1024) pooled context WITHOUT the
    broadcast+concat.  The last 1024 rows of every head's first Dense
    kernel then multiply a per-frame vector instead of N copies of it
    (see ``PredictionHead``), saving 1024/1792 of the three heads'
    first-layer MACs and the (B, N, 1792) HBM materialization.
    """
    train: bool = True
    dtype: jnp.dtype = jnp.float32
    split_global: bool = False

    @nn.compact
    def __call__(self, rgb_emb, cld_emb):
        # rgb_emb, cld_emb: (B, N, 128)
        feat_1 = jnp.concatenate([rgb_emb, cld_emb], axis=-1)        # 256
        rgb = nn.relu(nn.Dense(256, dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name="conv2_rgb")(rgb_emb))
        cld = nn.relu(nn.Dense(256, dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name="conv2_cld")(cld_emb))
        feat_2 = jnp.concatenate([rgb, cld], axis=-1)                # 512
        rgbd = nn.relu(nn.Dense(512, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name="conv3")(feat_1))
        rgbd = nn.relu(nn.Dense(1024, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name="conv4")(rgbd))
        global_feat = jnp.mean(rgbd, axis=1, keepdims=True)          # 1024
        local = jnp.concatenate([feat_1, feat_2], axis=-1)           # 768
        if self.split_global:
            return local, global_feat
        global_feat = jnp.broadcast_to(
            global_feat, rgbd.shape[:-1] + (1024,))
        return jnp.concatenate([local, global_feat], axis=-1)        # 1792


class _SplitDense(nn.Module):
    """``nn.Dense`` twin (identical param tree: ``kernel`` of shape
    (in_local + in_global, features) + ``bias``) evaluated on a
    block-structured input: ``local @ K[:d] + (g @ K[d:] + bias)``.
    ``g`` is per-frame (B, 1, C_g), so its term costs O(B), not O(B*N).
    Exact in f32 up to summation regrouping (the two partial products
    are accumulated separately before the add)."""
    features: int
    in_total: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, local, g):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_total, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        d = local.shape[-1]
        local, g, kernel, bias = nn.dtypes.promote_dtype(
            local, g, kernel, bias, dtype=self.dtype)
        return local @ kernel[:d] + (g @ kernel[d:] + bias)


class PredictionHead(nn.Module):
    """Dense + BN + ReLU stack with a linear output layer.

    Reference: the Seq conv1d head builders (pvn3d.py:245-267).
    """
    widths: Sequence[int]
    out_dim: int
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bn_momentum=0.1):
        for i, w in enumerate(self.widths):
            if i == 0 and isinstance(x, tuple):
                # Split fusion output (see DenseFusion.split_global): the
                # global rows of dense0's kernel hit a per-frame vector.
                local, g = x
                x = _SplitDense(w, local.shape[-1] + g.shape[-1],
                                dtype=self.dtype, name="dense0")(local, g)
            else:
                x = nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"dense{i}")(x)
            x = BatchNorm(use_running_average=not self.train,
                          dtype=self.dtype, name=f"bn{i}")(x, bn_momentum)
            x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="out")(x)


class PVN3D(nn.Module):
    """Full model.  ``sparse_cnn`` evaluates the CNN tail only at the
    sampled pixels — identical parameters and outputs to the dense gather
    path (see PSPNetEmbedding).  None = auto: ModelConfig.sparse_cnn_eval
    in eval mode, always dense in train mode (full-map batch stats)."""
    cfg: ModelConfig
    train: bool = True
    sparse_cnn: Optional[bool] = None

    @nn.compact
    def __call__(self, pointcloud, rgb, choose, bn_momentum=0.1):
        """Forward pass.

        Args:
          pointcloud: (B, N, 9) xyz + per-point rgb + normal.
          rgb: (B, H, W, 3) normalized image.
          choose: (B, N) int32 flat pixel index of each sampled point.
          bn_momentum: torch-convention BN momentum (scheduled input).

        Returns:
          dict with ``seg_logits`` (B, N, n_classes) raw logits,
          ``kp_offsets`` (B, n_kps, N, 3), ``ctr_offsets`` (B, 1, N, 3),
          ``rgb_seg`` (B, H, W, n_classes) auxiliary image-space log-probs
          (None in sparse mode).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        b, n, _ = pointcloud.shape

        cnn = PSPNetEmbedding(
            n_classes=cfg.n_classes, sizes=cfg.cnn.psp_sizes,
            psp_out=cfg.cnn.psp_out, up_channels=cfg.cnn.up_channels,
            embedding_dim=cfg.cnn.embedding_dim,
            dropout_psp=cfg.cnn.dropout_psp, dropout_up=cfg.cnn.dropout_up,
            backbone_layers=cfg.cnn.backbone_layers,
            resize_method=cfg.cnn.resize_method,
            fuse_up=cfg.cnn.fuse_upsample,
            train=self.train, dtype=dtype, name="cnn")

        # Auto mode picks sparse only at batch 1: the sparse tail's
        # per-point bilinear patch gathers scale worse than the dense
        # conv+gather with batch (measured v5-lite full forward, ms:
        # B=1 7.59 sparse vs 8.32 dense; B=2 21.9 vs 19.2; B=4 41.3 vs
        # 37.2 — benchmarks/stage_breakdown.py --batch).
        use_sparse = (self.sparse_cnn if self.sparse_cnn is not None
                      else (not self.train and cfg.sparse_cnn_eval
                            and b == 1))
        if use_sparse:
            rgb_emb, rgb_seg = cnn(rgb.astype(dtype), bn_momentum,
                                   choose=choose.astype(jnp.int32))
        else:
            emb_map, rgb_seg = cnn(rgb.astype(dtype), bn_momentum)
            # Gather the per-pixel embedding of every sampled point
            # (reference: pvn3d.py:288-292, channels-last here).
            h, w, di = emb_map.shape[1], emb_map.shape[2], emb_map.shape[3]
            emb_flat = emb_map.reshape(b, h * w, di)
            rgb_emb = jnp.take_along_axis(
                emb_flat, choose[..., None].astype(jnp.int32), axis=1)

        cld_emb = PointNet2MSG(cfg=cfg.pointnet2, train=self.train,
                               dtype=dtype, name="pointnet2")(
                                   pointcloud, bn_momentum)

        # Eval-only matmul restructure (train keeps the literal concat so
        # grads/batch stats match the contract bit-for-bit).
        split = (not self.train) and cfg.head_split_global
        fused = DenseFusion(train=self.train, dtype=dtype,
                            split_global=split,
                            name="fusion")(rgb_emb, cld_emb)

        seg = PredictionHead(cfg.seg_head, cfg.n_classes, train=self.train,
                             dtype=dtype, name="seg_head")(fused, bn_momentum)
        kp_of = PredictionHead(cfg.kp_head, cfg.n_keypoints * 3,
                               train=self.train, dtype=dtype,
                               name="kp_head")(fused, bn_momentum)
        ctr_of = PredictionHead(cfg.ctr_head, 3, train=self.train,
                                dtype=dtype, name="ctr_head")(
                                    fused, bn_momentum)

        # (B, N, n_kps*3) -> (B, n_kps, N, 3); the reference's reshape path
        # (pvn3d.py:300-309) goes through (bs, n_kps, 3, N) channels-first —
        # same layout contract at the output.
        kp_offsets = kp_of.reshape(b, n, cfg.n_keypoints, 3)
        kp_offsets = jnp.transpose(kp_offsets, (0, 2, 1, 3))
        ctr_offsets = ctr_of.reshape(b, n, 1, 3)
        ctr_offsets = jnp.transpose(ctr_offsets, (0, 2, 1, 3))
        return {
            "seg_logits": seg.astype(jnp.float32),
            "kp_offsets": kp_offsets.astype(jnp.float32),
            "ctr_offsets": ctr_offsets.astype(jnp.float32),
            "rgb_seg": rgb_seg,
        }
