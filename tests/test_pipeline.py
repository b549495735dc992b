"""End-to-end jitted inference pipeline on the tiny model config."""
import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.data.synthetic import synthetic_batch
from pvn3d_tpu.inference.pipeline import (make_icp_step, make_inference_step,
                                          make_pose_fn)
from pvn3d_tpu.models.pvn3d import PVN3D

import __graft_entry__ as graft


def _setup():
    cfg = graft._tiny_config()
    n_cls = cfg.model.n_classes
    rng = np.random.RandomState(0)
    mesh_kps = rng.uniform(-0.05, 0.05,
                           (n_cls, cfg.model.n_keypoints + 1, 3)
                           ).astype(np.float32)
    radii = np.ones(n_cls, np.float32) * 0.1
    mesh_pts = rng.uniform(-0.05, 0.05, (n_cls, 128, 3)).astype(np.float32)
    mesh_valid = np.ones((n_cls, 128), bool)
    batch = synthetic_batch(cfg, batch_size=2,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    model = PVN3D(cfg=cfg.model, train=False)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch["pointcloud"]),
        jnp.asarray(batch["rgb"]), jnp.asarray(batch["choose"]))
    return cfg, batch, model, variables, mesh_kps, radii, mesh_pts, mesh_valid


def test_inference_step_shapes_and_metrics():
    (cfg, batch, model, variables, mesh_kps, radii, mesh_pts,
     mesh_valid) = _setup()
    n_cls = cfg.model.n_classes
    step = make_inference_step(cfg, model, variables, mesh_kps, radii,
                               mesh_pts, mesh_valid)
    out = step(batch)
    n = cfg.model.n_sample_points
    assert out["poses"].shape == (2, n_cls, 3, 4)
    assert out["present"].shape == (2, n_cls)
    assert out["seg"].shape == (2, n)
    assert out["add"].shape == batch["cls_ids"].shape
    assert np.isfinite(np.asarray(out["add"])).all()
    # Pose rows for absent classes must be zero.
    poses = np.asarray(out["poses"])
    present = np.asarray(out["present"])
    assert (np.abs(poses[~present]) < 1e-6).all()


def test_icp_step_runs_and_preserves_shape():
    (cfg, batch, model, variables, mesh_kps, radii, mesh_pts,
     mesh_valid) = _setup()
    step = make_inference_step(cfg, model, variables, mesh_kps, radii,
                               mesh_pts, mesh_valid)
    out = step(batch)
    icp = make_icp_step(cfg, mesh_pts, mesh_valid)
    refined = icp(jnp.asarray(batch["pointcloud"][..., :3]), out["seg"],
                  out["poses"])
    assert refined.shape == out["poses"].shape
    assert np.isfinite(np.asarray(refined)).all()


def test_raw_inference_step_sensor_to_pose():
    """Sensor-to-pose path: on-device fill/normals/sampling feeding the
    same perceive->vote->cluster->fit program."""
    from pvn3d_tpu.inference.pipeline import make_raw_inference_step
    cfg, batch, model, variables, mesh_kps, radii, _, _ = _setup()
    n_cls = cfg.model.n_classes
    step = make_raw_inference_step(cfg, model, variables, mesh_kps, radii,
                                   fill_depth=True)
    rng = np.random.RandomState(0)
    depth = np.full((2, 64, 64), 1.0, np.float32)
    depth[:, 20:40, 20:44] = 0.8
    depth[:, 5:9, 5:9] = 0.0                       # holes to fill
    rgb = (rng.rand(2, 64, 64, 3) * 255).astype(np.float32)
    cam_k = np.tile(np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
                             np.float32), (2, 1, 1))
    out = step({"rgb": jnp.asarray(rgb), "depth": jnp.asarray(depth),
                "cam_k": jnp.asarray(cam_k)}, jax.random.PRNGKey(0))
    n = cfg.model.n_sample_points
    assert out["poses"].shape == (2, n_cls, 3, 4)
    assert out["seg"].shape == (2, n)
    assert out["choose"].shape == (2, n)
    assert np.isfinite(np.asarray(out["poses"])).all()
    # the filled depth must have no holes left in the top-masked region
    dm = np.asarray(out["depth_m"])
    assert (dm[:, 5:9, 5:9] > 0.5).all()


def test_icp_refine_fn_fullres_and_fallback():
    """The app-level ICP closure (apps/evaluate --icp): a batch WITH the
    full-res depth map drives the reference-parity full-res scene path;
    a batch WITHOUT falls back to the sampled cloud and warns LOUDLY
    (eval_icp.py:224-291 priority)."""
    from pvn3d_tpu.inference.pipeline import make_icp_refine_fn
    (cfg, batch, model, variables, mesh_kps, radii, mesh_pts,
     mesh_valid) = _setup()
    step = make_inference_step(cfg, model, variables, mesh_kps, radii,
                               mesh_pts, mesh_valid)
    out = step(batch)
    warnings = []
    refine = make_icp_refine_fn(cfg, mesh_pts, mesh_valid,
                                warn=warnings.append)

    # Full-res: depth + intrinsics present (FrameSpec.keep_depth layout).
    rng = np.random.RandomState(1)
    depth = rng.uniform(0.5, 1.5, (2, 64, 64)).astype(np.float32)
    cam_k = np.tile(np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
                             np.float32), (2, 1, 1))
    full = dict(batch, depth=depth, cam_k=cam_k)
    add, adds = refine(full, out)
    assert refine.mode == "fullres"
    assert not warnings
    assert add.shape == batch["cls_ids"].shape
    assert np.isfinite(np.asarray(add)).all()

    # Sampled fallback: no depth in the batch -> one loud warning.
    add2, adds2 = refine(batch, out)
    assert refine.mode == "sampled"
    assert len(warnings) == 1 and "NOT eval_icp.py parity" in warnings[0]
    refine(batch, out)
    assert len(warnings) == 1          # warned once, not per batch
    assert np.isfinite(np.asarray(add2)).all()


def test_evaluate_icp_flag_keeps_depth_in_batches():
    """--icp sets FrameSpec.keep_depth so raw-frame loader batches carry
    the full-res depth + intrinsics the refine closure needs."""
    import argparse

    from pvn3d_tpu.apps.train import make_dataset_factory

    args = argparse.Namespace(dataset="linemod", cls="ape",
                              data_root="/nonexistent", seed=0,
                              no_fill_depth=False, icp=True)
    ds_factory = make_dataset_factory(args, "test")
    spec = ds_factory.keywords["spec"]
    assert spec.keep_depth
    args.icp = False
    spec = make_dataset_factory(args, "test").keywords["spec"]
    assert not spec.keep_depth
