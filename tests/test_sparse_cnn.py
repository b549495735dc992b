"""Sparse CNN tail == dense tail + gather, with shared parameters."""
import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.models.pspnet import PSPNetEmbedding
from pvn3d_tpu.models.pvn3d import PVN3D

import __graft_entry__ as graft


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
