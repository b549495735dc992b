"""Sparse CNN tail == dense tail + gather, with shared parameters."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.models.pspnet import PSPNetEmbedding, PSPUpsample
from pvn3d_tpu.models.pvn3d import PVN3D

import __graft_entry__ as graft


def test_psp_upsample_fused_matches_dense():
    """The resize-into-conv fused stage (PSPUpsample.fused) computes the
    same function as resize2x -> pad -> VALID conv -> BN -> PReLU, in f32
    (summation-order rounding only) and bf16 (one-ulp-scale rounding)."""
    rng = np.random.RandomState(3)
    for (h, w, cin, co) in [(6, 8, 16, 8), (15, 20, 32, 16)]:
        x32 = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
        mod = PSPUpsample(features=co, train=False, dtype=jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x32)
        y0 = mod.apply(variables, x32)
        y1 = mod.apply(variables, x32, method=PSPUpsample.fused)
        assert y1.shape == (2, 2 * h, 2 * w, co)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-5)
        modb = PSPUpsample(features=co, train=False, dtype=jnp.bfloat16)
        y0b = modb.apply(variables, x32.astype(jnp.bfloat16))
        y1b = modb.apply(variables, x32.astype(jnp.bfloat16),
                         method=PSPUpsample.fused)
        scale = float(jnp.max(jnp.abs(y0b.astype(jnp.float32))))
        np.testing.assert_allclose(
            np.asarray(y0b, np.float32), np.asarray(y1b, np.float32),
            atol=0.05 * max(scale, 1.0))


def test_pvn3d_fuse_upsample_matches_standard():
    """fuse_upsample=True is a pure eval-mode restructure of the dense
    upsample stages: same params, near-identical outputs."""
    cfg = graft._tiny_config()
    cnn_fused = dataclasses.replace(cfg.model.cnn, fuse_upsample=True)
    mcfg_fused = dataclasses.replace(cfg.model, cnn=cnn_fused)
    from pvn3d_tpu.data.synthetic import synthetic_batch
    batch = synthetic_batch(cfg, batch_size=1,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    base = PVN3D(cfg=cfg.model, train=False)
    variables = jax.jit(base.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch["pointcloud"]),
        jnp.asarray(batch["rgb"]), jnp.asarray(batch["choose"]))
    fused = PVN3D(cfg=mcfg_fused, train=False)
    out0 = base.apply(variables, batch["pointcloud"], batch["rgb"],
                      batch["choose"])
    out1 = fused.apply(variables, batch["pointcloud"], batch["rgb"],
                       batch["choose"])
    for k in ("seg_logits", "kp_offsets", "ctr_offsets"):
        ref = np.asarray(out0[k])
        got = np.asarray(out1[k])
        atol = 0.05 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(got, ref, atol=atol)


def test_pspnet_sparse_matches_dense_gather():
    rng = np.random.RandomState(0)
    mod = PSPNetEmbedding(n_classes=5, psp_out=64, up_channels=(16, 8, 8),
                          embedding_dim=12, backbone_layers=(1, 1, 1, 1),
                          train=False, dtype=jnp.float32)
    rgb = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), rgb)
    emb_map, seg = mod.apply(variables, rgb)
    assert emb_map.shape == (2, 64, 64, 12)
    choose = jnp.asarray(rng.randint(0, 64 * 64, (2, 50)).astype(np.int32))
    dense_gather = jnp.take_along_axis(
        emb_map.reshape(2, -1, 12), choose[..., None], axis=1)
    sparse, seg_s = mod.apply(variables, rgb, choose=choose)
    np.testing.assert_allclose(np.asarray(sparse),
                               np.asarray(dense_gather), atol=2e-5)
    # The sparse tail also evaluates final_seg per point (keeps the
    # variable tree identical to the dense/train tree); it must equal the
    # dense log-softmax map gathered at choose.
    seg_gather = jnp.take_along_axis(
        seg.reshape(2, -1, 5), choose[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(seg_s), np.asarray(seg_gather),
                               atol=2e-5)


def test_pvn3d_sparse_matches_dense():
    cfg = graft._tiny_config()
    from pvn3d_tpu.data.synthetic import synthetic_batch
    batch = synthetic_batch(cfg, batch_size=2,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    dense = PVN3D(cfg=cfg.model, train=False, sparse_cnn=False)
    variables = jax.jit(dense.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch["pointcloud"]),
        jnp.asarray(batch["rgb"]), jnp.asarray(batch["choose"]))
    sparse = PVN3D(cfg=cfg.model, train=False, sparse_cnn=True)
    out_d = dense.apply(variables, batch["pointcloud"], batch["rgb"],
                        batch["choose"])
    out_s = sparse.apply(variables, batch["pointcloud"], batch["rgb"],
                         batch["choose"])
    np.testing.assert_allclose(np.asarray(out_d["seg_logits"]),
                               np.asarray(out_s["seg_logits"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_d["kp_offsets"]),
                               np.asarray(out_s["kp_offsets"]), atol=1e-4)
