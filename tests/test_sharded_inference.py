"""Inference pipeline under a dp-sharded mesh == single-device results."""
import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.data.synthetic import synthetic_batch
from pvn3d_tpu.inference.pipeline import make_inference_step
from pvn3d_tpu.models.pvn3d import PVN3D
from pvn3d_tpu.parallel.mesh import make_mesh, shard_batch

import __graft_entry__ as graft


def test_dp_sharded_inference_matches_unsharded():
    cfg = graft._tiny_config()
    n_cls = cfg.model.n_classes
    rng = np.random.RandomState(0)
    mesh_kps = rng.uniform(-0.05, 0.05,
                           (n_cls, cfg.model.n_keypoints + 1, 3)
                           ).astype(np.float32)
    radii = np.ones(n_cls, np.float32) * 0.1
    mesh_pts = rng.uniform(-0.05, 0.05, (n_cls, 128, 3)).astype(np.float32)
    mesh_valid = np.ones((n_cls, 128), bool)
    batch = synthetic_batch(cfg, batch_size=4,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    model = PVN3D(cfg=cfg.model, train=False)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch["pointcloud"]),
        jnp.asarray(batch["rgb"]), jnp.asarray(batch["choose"]))
    step = make_inference_step(cfg, model, variables, mesh_kps, radii,
                               mesh_pts, mesh_valid)
    ref = step(batch)

    mesh = make_mesh(dp=4, sp=2)
    with mesh:
        out = step(shard_batch(mesh, batch))
    np.testing.assert_allclose(np.asarray(ref["poses"]),
                               np.asarray(out["poses"]), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(ref["seg"]),
                                  np.asarray(out["seg"]))
    np.testing.assert_allclose(np.asarray(ref["add"]),
                               np.asarray(out["add"]), atol=1e-4)


def test_raw_sensor_to_pose_dp_sharded_matches_unsharded():
    """The sensor-to-pose program (on-device preprocessing included,
    inference/pipeline.py::make_raw_inference_step) under a dp mesh ==
    single-device results: the whole chain shards over frames."""
    from pvn3d_tpu.inference.pipeline import make_raw_inference_step

    cfg = graft._tiny_config()
    n_cls = cfg.model.n_classes
    rng = np.random.RandomState(1)
    mesh_kps = rng.uniform(-0.05, 0.05,
                           (n_cls, cfg.model.n_keypoints + 1, 3)
                           ).astype(np.float32)
    radii = np.ones(n_cls, np.float32) * 0.1

    depth = np.full((4, 64, 64), 1.0, np.float32)
    depth[:, 20:40, 20:44] = 0.8
    depth[:, 5:9, 5:9] = 0.0
    rgb = (rng.rand(4, 64, 64, 3) * 255).astype(np.float32)
    cam_k = np.tile(np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
                             np.float32), (4, 1, 1))
    batch = {"rgb": rgb, "depth": depth, "cam_k": cam_k}

    pc0 = jnp.zeros((4, cfg.model.n_sample_points, 9), jnp.float32)
    ch0 = jnp.zeros((4, cfg.model.n_sample_points), jnp.int32)
    model = PVN3D(cfg=cfg.model, train=False)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), pc0, jnp.asarray(rgb), ch0)
    step = make_raw_inference_step(cfg, model, variables, mesh_kps, radii,
                                   fill_depth=True)
    key = jax.random.PRNGKey(3)
    ref = step({k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = make_mesh(dp=4, sp=2)
    with mesh:
        out = step(shard_batch(mesh, batch), key)
    np.testing.assert_allclose(np.asarray(ref["poses"]),
                               np.asarray(out["poses"]), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(ref["seg"]),
                                  np.asarray(out["seg"]))
