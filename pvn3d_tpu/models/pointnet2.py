"""PointNet++ MSG semantic-segmentation trunk (flax.linen, channels-last).

Capability match for the reference's Pointnet2MSG (pvn3d/lib/pvn3d.py:46-154)
built on the TPU-native op suite (pvn3d_tpu.ops): four set-abstraction levels
with multi-scale ball-query grouping + shared MLP + max pool, then four
feature-propagation levels with 3-NN inverse-distance interpolation.  Exact
widths/radii/nsamples of the reference (pvn3d.py:67-118) come from the config
tree.  Grouped tensors are (B, npoint, nsample, C): the shared MLPs are Dense
contractions on the trailing axis — large batched MXU matmuls.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pvn3d_tpu.config import PointNet2Config, SALevelConfig
from pvn3d_tpu.models.layers import SharedMLP
from pvn3d_tpu.ops import (
    furthest_point_sample, gather_points, three_nn, three_interpolate,
)
from pvn3d_tpu.ops.grouping import ball_query_multi, group_points
from pvn3d_tpu.ops.interpolate import idw_weights


def resolve_query_mode(mode: str, train: bool, backend: str) -> str:
    """Phase-aware ball-query mode resolution (pure; unit-tested).

    "auto" keeps the fused pallas kernel for EVAL on TPU (best measured
    accuracy arm) but trains through approx — the r4 600-step A/B
    measured ~12 synthetic-e2e ADD-AUC lost to training through the
    pallas kernel's capacity-limited neighbor sets (26.88/0.797 vs
    38.85/0.841).  Explicit modes pass through verbatim; off-TPU the
    downstream "auto" resolves to exact top_k (ops/grouping.py).
    """
    if mode != "auto":
        return mode
    if train:
        return "approx" if backend == "tpu" else "auto"
    return mode


class SetAbstractionMSG(nn.Module):
    """One SA level: FPS centroids + per-radius group/MLP/max-pool.

    Reference: _PointnetSAModuleBase.forward + PointnetSAModuleMSG
    (pointnet2_modules.py:27-112).
    """
    level: SALevelConfig
    use_xyz: bool = True
    train: bool = True
    dtype: jnp.dtype = jnp.float32
    query_mode: str = "auto"
    query_compute: str = "f32"
    # Match PointNet2Config's validated default: evaluating at 0.95
    # measurably costs accuracy (config.py::query_recall notes).
    query_recall: float = 0.99
    query_capacity: int = 2
    fps_groups: int = 1
    # PointNet2Config.fps_mode: "auto" dispatches on the backend,
    # "pallas"/"xla" force one kernel arm.
    fps_mode: str = "auto"
    # Input already slab-partitioned (output of a previous grouped-FPS
    # level is slab-major) — skips the per-level argsort.
    fps_slab_sorted: bool = False
    # Input is the pick-ordered output of a previous EXACT FPS level:
    # greedy FPS is prefix-consistent (pick k+1 maximizes min-dist over
    # the full set, hence over any subset containing it — the sampled
    # set), so this level's FPS result is exactly rows [0, npoint) of the
    # input.  Skips the m-step serial chain entirely; bit-identical to
    # running FPS (modulo float-tie ordering).  Verified by
    # tests/test_ops.py::TestFPSPrefix and the model-level equivalence
    # test in tests/test_models.py.
    fps_prefix: bool = False
    # Eval-only gather-after-matmul: the first SharedMLP layer's feature
    # term (feat @ K0[3:]) is computed per SOURCE point before grouping —
    # N rows instead of np*ns pairs, and the gather moves widths[0]
    # channels instead of C.  Exact up to one f32 add reassociation
    # (layers.py::SharedMLP docstring); train mode keeps the standard
    # path (grouped batch statistics feed the BN).
    precompute_first: bool = True

    @nn.compact
    def __call__(self, xyz, features, bn_momentum=0.1):
        # FPS runs on f32 coordinates; indices are reused for every scale,
        # and the scales share one distance matrix (ball_query_multi).
        if self.fps_prefix:
            new_xyz = xyz[:, :self.level.npoint]
        else:
            idx = furthest_point_sample(
                xyz, self.level.npoint,
                use_pallas=(None if self.fps_mode == "auto"
                            else self.fps_mode == "pallas"),
                groups=self.fps_groups,
                slab_sorted=self.fps_slab_sorted)
            new_xyz = gather_points(xyz, idx)
        qmode = resolve_query_mode(self.query_mode, self.train,
                                   jax.default_backend())
        scale_idx = ball_query_multi(self.level.radii, self.level.nsamples,
                                     xyz, new_xyz, mode=qmode,
                                     recall=self.query_recall,
                                     compute_dtype=self.query_compute,
                                     capacity=self.query_capacity)
        outs = []
        for i, (g_idx, widths) in enumerate(zip(scale_idx, self.level.mlps)):
            mlp = SharedMLP(widths, train=self.train, dtype=self.dtype,
                            name=f"mlp{i}")
            grouped_xyz = group_points(xyz, g_idx) - new_xyz[:, :, None, :]
            fast = (self.precompute_first and not self.train
                    and not self.is_initializing()
                    and self.use_xyz and features is not None)
            if fast:
                pre = mlp.precompute_first(features, n_lead=3)  # (B, N, W0)
                grouped_pre = group_points(pre, g_idx)
                feat = mlp(grouped_xyz.astype(self.dtype), bn_momentum,
                           first_precomputed=grouped_pre)
            else:
                if features is not None:
                    grouped_feat = group_points(features, g_idx)
                    grouped = (jnp.concatenate(
                        [grouped_xyz, grouped_feat], -1)
                        if self.use_xyz else grouped_feat)
                else:
                    grouped = grouped_xyz
                grouped = grouped.astype(self.dtype)  # (B, np, ns, 3+C)
                feat = mlp(grouped, bn_momentum)
            outs.append(jnp.max(feat, axis=2))    # (B, np, width)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """One FP level: 3-NN IDW interpolation + skip concat + shared MLP.

    Reference: PointnetFPModule (pointnet2_modules.py:146-206).
    """
    widths: Sequence[int]
    train: bool = True
    dtype: jnp.dtype = jnp.float32
    query_mode: str = "auto"
    # 3-NN interpolation kernel (PointNet2Config.interp_mode): decoupled
    # from query_mode because the two kernels were validated separately;
    # both default to the fused pallas form on TPU (the ball query after
    # its synthetic-e2e accuracy A/B — ADD-AUC 33.8 vs 32.6 approx on the
    # same checkpoint — and this one because it is exact and wins at
    # every FP level, benchmarks/fp_bench.py).
    interp_mode: str = "auto"
    # Eval-only matmul-before-interpolate: IDW interpolation is a
    # pointwise linear blend, so the first SharedMLP layer's known-side
    # term satisfies Dense_0(interp(known)) == interp(Dense_0(known)) —
    # computed on the m known rows instead of the n (>= 2x, 6x at the
    # finest level) interpolated rows, and the 3-NN gather then moves
    # widths[0] channels instead of C_known.  Exact up to f32 dot-product
    # reassociation (equivalence-tested); train mode keeps the standard
    # path (mirrors the SA restructure's batch-stat constraint).
    precompute_first: bool = True

    def _interp(self, unknown_xyz, known_xyz, feats):
        """3-NN IDW blend of (B, m, C) ``feats`` onto unknown_xyz."""
        mode = self.interp_mode
        if mode == "auto":
            mode = ("pallas" if (self.query_mode == "pallas"
                                 or jax.default_backend() == "tpu")
                    else "auto")
        if mode == "pallas":
            # Fused exact 3-NN + IDW blend (ops/pallas/interp.py): no
            # (n, 3, C) HBM intermediate; grads reach feats only
            # (coords are data in every PVN3D use).
            from pvn3d_tpu.ops.pallas.interp import three_interpolate_fused
            interp, _, _ = three_interpolate_fused(
                unknown_xyz, known_xyz, feats.astype(jnp.float32),
                1e-8, jax.default_backend() != "tpu")
            return interp.astype(self.dtype)
        dist, idx = three_nn(unknown_xyz, known_xyz, mode=mode)
        w = idw_weights(dist)
        return three_interpolate(
            feats.astype(jnp.float32), idx, w).astype(self.dtype)

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 bn_momentum=0.1):
        mlp = SharedMLP(self.widths, train=self.train, dtype=self.dtype,
                        name="mlp")
        fast = (self.precompute_first and not self.train
                and not self.is_initializing()
                and unknown_feats is not None)
        if fast:
            pre = mlp.precompute_leading(known_feats)       # (B, m, W0)
            interp_pre = self._interp(unknown_xyz, known_xyz, pre)
            return mlp(unknown_feats.astype(self.dtype), bn_momentum,
                       first_precomputed=interp_pre,
                       x_offset=known_feats.shape[-1])
        interp = self._interp(unknown_xyz, known_xyz, known_feats)
        if unknown_feats is not None:
            interp = jnp.concatenate(
                [interp, unknown_feats.astype(self.dtype)], axis=-1)
        return mlp(interp, bn_momentum)


class PointNet2MSG(nn.Module):
    """Full SA/FP trunk: (B, N, 3 + C_in) -> (B, N, fp_mlps[0][-1])."""
    cfg: PointNet2Config
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pointcloud, bn_momentum=0.1) -> jnp.ndarray:
        xyz = pointcloud[..., :3].astype(jnp.float32)
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        l_xyz = [xyz]
        l_feats = [features]
        for li, level in enumerate(self.cfg.sa_levels):
            nxyz, nfeat = SetAbstractionMSG(
                level=level, use_xyz=self.cfg.use_xyz, train=self.train,
                dtype=self.dtype, query_mode=self.cfg.query_mode,
                query_compute=self.cfg.query_compute,
                query_recall=self.cfg.query_recall,
                query_capacity=self.cfg.query_capacity,
                precompute_first=self.cfg.sa_precompute_first,
                fps_groups=self.cfg.fps_groups,
                fps_mode=self.cfg.fps_mode,
                fps_slab_sorted=self.cfg.fps_groups > 1 and li > 0,
                fps_prefix=(self.cfg.fps_prefix
                            and self.cfg.fps_groups == 1 and li > 0),
                name=f"sa{li}")(
                    l_xyz[li], l_feats[li], bn_momentum)
            l_xyz.append(nxyz)
            l_feats.append(nfeat)

        # Propagate coarsest -> finest (reference: pvn3d.py:149-152).
        n_levels = len(self.cfg.sa_levels)
        for li in range(n_levels - 1, -1, -1):
            l_feats[li] = FeaturePropagation(
                widths=self.cfg.fp_mlps[li], train=self.train,
                dtype=self.dtype, query_mode=self.cfg.query_mode,
                interp_mode=self.cfg.interp_mode,
                precompute_first=self.cfg.fp_precompute_first,
                name=f"fp{li}")(
                    l_xyz[li], l_xyz[li + 1], l_feats[li], l_feats[li + 1],
                    bn_momentum)
        return l_feats[0]
