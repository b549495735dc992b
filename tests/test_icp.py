"""Batched ICP: SE(3) roundtrip property tests (the reference's only real
correctness test — lib/utils/icp/test.py — does the same roundtrip)."""
import jax
import numpy as np

from pvn3d_tpu.geometry.se3 import random_pose, transform_points
from pvn3d_tpu.inference.icp import (biggest_cluster_mask, compose_poses,
                                     icp_refine, refine_frame_poses)


def _problem(seed, n_mesh=300, jitter=0.0, pad=50):
    rng = np.random.RandomState(seed)
    mesh = rng.uniform(-0.05, 0.05, (n_mesh, 3)).astype(np.float32)
    gt = np.array(random_pose(jax.random.PRNGKey(seed), max_trans=0.2))
    gt[2, 3] += 1.0
    scene = np.asarray(transform_points(gt, mesh))
    if jitter:
        scene = scene + rng.normal(0, jitter, scene.shape).astype(np.float32)
    # Slightly perturbed init pose.
    d = np.array(random_pose(jax.random.PRNGKey(seed + 100), max_trans=0.0))
    eps = 0.15
    r_init = gt[:, :3] @ (np.eye(3) * (1 - eps) + d[:, :3] * eps)
    u, _, vt = np.linalg.svd(r_init)
    r_init = u @ vt
    init = np.concatenate(
        [r_init, gt[:, 3:] + rng.normal(0, 0.02, (3, 1))], axis=1
    ).astype(np.float32)
    mesh_p = np.concatenate([mesh, np.zeros((pad, 3), np.float32)])
    mesh_v = np.arange(n_mesh + pad) < n_mesh
    scene_p = np.concatenate([scene, np.full((pad, 3), 50.0, np.float32)])
    scene_v = np.arange(n_mesh + pad) < n_mesh
    return mesh_p, mesh_v, scene_p, scene_v, init, gt


def test_compose_poses():
    a = np.array(random_pose(jax.random.PRNGKey(0)))
    b = np.array(random_pose(jax.random.PRNGKey(1)))
    pts = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    lhs = np.asarray(transform_points(compose_poses(a, b), pts))
    rhs = np.asarray(transform_points(a, np.asarray(
        transform_points(b, pts))))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_icp_recovers_exact_pose():
    probs = [_problem(s) for s in range(3)]
    args = [np.stack(x) for x in zip(*[p[:5] for p in probs])]
    poses, err, iters = icp_refine(*args, max_iter=100, tolerance=1e-9)
    for i, p in enumerate(probs):
        np.testing.assert_allclose(np.asarray(poses[i]), p[5], atol=2e-3)
    assert float(err.max()) < 1e-3


def test_icp_noisy_scene():
    probs = [_problem(s, jitter=0.002) for s in range(2)]
    args = [np.stack(x) for x in zip(*[p[:5] for p in probs])]
    poses, err, _ = icp_refine(*args, max_iter=100, tolerance=1e-9)
    for i, p in enumerate(probs):
        # Rotation within a few degrees, translation within ~4 mm.
        dr = np.asarray(poses[i])[:, :3] @ p[5][:, :3].T
        ang = np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1))
        assert ang < 0.1
        assert np.linalg.norm(np.asarray(poses[i])[:, 3] - p[5][:, 3]) < 0.004


def test_biggest_cluster_mask():
    rng = np.random.RandomState(0)
    a = rng.normal([0, 0, 1], 0.01, (80, 3)).astype(np.float32)
    b = rng.normal([1, 1, 2], 0.01, (20, 3)).astype(np.float32)
    pts = np.concatenate([a, b])[None]
    valid = np.ones((1, 100), bool)
    m = np.asarray(biggest_cluster_mask(pts, valid, bandwidth=0.06))
    assert m[0, :80].all() and not m[0, 80:].any()


def test_refine_gating_keeps_init_when_sparse():
    mesh_p, mesh_v, scene_p, scene_v, init, gt = _problem(0)
    poses, _, _ = refine_frame_poses(
        init[None], mesh_p[None], mesh_v[None], scene_p[None],
        scene_v[None], min_points=1500, use_cluster_filter=False)
    # 300 < 1500 scene points -> init pose unchanged.
    np.testing.assert_allclose(np.asarray(poses[0]), init, atol=1e-6)
    poses2, _, _ = refine_frame_poses(
        init[None], mesh_p[None], mesh_v[None], scene_p[None],
        scene_v[None], min_points=100, use_cluster_filter=False)
    np.testing.assert_allclose(np.asarray(poses2[0]), gt, atol=2e-3)
