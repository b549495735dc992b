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


# ---------------------------------------------------------------------------
# Full-resolution scene path (reference: eval_icp.py:224-291, :388-426).
# ---------------------------------------------------------------------------
import jax.numpy as jnp

from pvn3d_tpu.inference.icp import (fullres_class_clouds,
                                     propagate_labels_fullres)


def test_propagate_labels_matches_numpy_1nn():
    rng = np.random.RandomState(0)
    cloud = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    valid = rng.rand(500) > 0.2
    samples = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    labels = rng.randint(0, 5, 64).astype(np.int32)
    got = np.asarray(propagate_labels_fullres(
        jnp.asarray(cloud), jnp.asarray(valid), jnp.asarray(samples),
        jnp.asarray(labels), chunk=128))
    d2 = ((cloud[:, None, :] - samples[None, :, :]) ** 2).sum(-1)
    want = np.where(valid, labels[np.argmin(d2, axis=1)], 0)
    np.testing.assert_array_equal(got, want)


def _depth_scene(h=32, w=48, n_cls=4):
    """A depth map whose left/right halves belong to classes 1 and 2."""
    rng = np.random.RandomState(1)
    depth = rng.uniform(0.5, 1.5, (h, w)).astype(np.float32)
    depth[:, -4:] = 0.0                       # invalid stripe
    label_map = np.zeros((h, w), np.int32)
    label_map[:, : w // 2] = 1
    label_map[:, w // 2:] = 2
    cam_k = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]],
                     np.float32)
    return depth, label_map, cam_k


def test_fullres_class_clouds_counts_and_membership():
    depth, label_map, cam_k = _depth_scene()
    h, w = depth.shape
    # Sampled cloud: one point per class region so 1-NN propagation is
    # unambiguous about sides.
    from pvn3d_tpu.geometry.cloud import depth_to_cloud_map
    cloud_map, valid_map = jax.jit(depth_to_cloud_map)(
        jnp.asarray(depth), jnp.asarray(cam_k))
    cloud_map = np.asarray(cloud_map)
    sample_cld = np.stack([cloud_map[h // 2, 2], cloud_map[h // 2, w - 8]])
    sample_labels = np.array([1, 2], np.int32)

    scene, valid, counts = jax.jit(
        lambda d, k, sc, sl: fullres_class_clouds(d, k, sc, sl, 4, 100)
    )(jnp.asarray(depth), jnp.asarray(cam_k), jnp.asarray(sample_cld),
      jnp.asarray(sample_labels))
    scene, valid, counts = map(np.asarray, (scene, valid, counts))

    # 1-NN propagation splits points by nearest sample; counts must cover
    # all valid pixels and class 3 must be empty.
    assert counts[0] + counts[1] == int((depth > 1e-6).sum())
    assert counts[2] == 0
    assert valid[0].sum() == min(counts[0], 100)
    assert valid[2].sum() == 0
    # Selected class-1 points all lie in the left half (x < center ray).
    sel = scene[0][valid[0]]
    assert (sel[:, 0] < 0.02).all()


def test_fullres_gate_uses_fullres_counts():
    """The ICP gate must fire on the full-res class count, not the capped
    selection (reference: eval_icp.py:146-151 gates on len(choose) of the
    full-res mask)."""
    depth, label_map, cam_k = _depth_scene()
    scene, valid, counts = jax.jit(
        lambda d, k, lm: fullres_class_clouds(
            d, k, jnp.zeros((4, 3)), jnp.zeros((4,), jnp.int32), 4, 100,
            label_map=lm)
    )(jnp.asarray(depth), jnp.asarray(cam_k), jnp.asarray(label_map))
    counts = np.asarray(counts)
    # Full-res counts far exceed the 100-point cap: a gate of 500 must
    # still pass (it sees counts, not the capped 100).
    assert counts[0] > 500 and int(np.asarray(valid)[0].sum()) == 100
    mesh_p, mesh_v, scene_p, scene_v, init, gt = _problem(3)
    refined, _, _ = refine_frame_poses(
        init[None], jnp.asarray(mesh_p)[None], jnp.asarray(mesh_v)[None],
        jnp.asarray(scene_p)[None], jnp.asarray(scene_v)[None],
        min_points=500, use_cluster_filter=False,
        gate_counts=jnp.asarray([600]))
    assert not np.allclose(np.asarray(refined)[0], init)   # gate open
    kept, _, _ = refine_frame_poses(
        init[None], jnp.asarray(mesh_p)[None], jnp.asarray(mesh_v)[None],
        jnp.asarray(scene_p)[None], jnp.asarray(scene_v)[None],
        min_points=500, use_cluster_filter=False,
        gate_counts=jnp.asarray([400]))
    np.testing.assert_allclose(np.asarray(kept)[0], init)  # gate closed


def test_empty_problem_does_not_pin_batch_at_max_iter():
    """A zero-valid-point problem must go inactive after one iteration
    (err stays 0, |prev-err| < tol) instead of holding the shared
    while_loop hostage: a mixed [empty, real] batch must terminate in
    the same iteration count as the real problem alone.  This is the
    invariant behind the recorded icp_sampled latency analysis —
    un-populated classes cost ~nothing (CLAUDE.md round-5 ICP note)."""
    mesh_p, mesh_v, scene_p, scene_v, init, _ = _problem(0)

    def stack(include_empty):
        return (
            np.stack([mesh_p, mesh_p]),
            np.stack([mesh_v, mesh_v]),
            np.stack([scene_p, scene_p]),
            np.stack([scene_v, np.zeros_like(scene_v)]),
            np.stack([init, init]),
        ) if include_empty else (
            mesh_p[None], mesh_v[None], scene_p[None],
            scene_v[None], init[None])

    _, _, iters_solo = icp_refine(*stack(False), max_iter=100)
    _, _, iters_mixed = icp_refine(*stack(True), max_iter=100)
    assert int(iters_mixed[0]) == int(iters_solo[0])
    assert int(iters_mixed[0]) < 100

    # An all-empty batch exits immediately.
    m, v, s, sv, p0 = stack(True)
    _, _, iters_empty = icp_refine(
        m[1:], v[1:], s[1:], np.zeros_like(sv[1:]), p0[1:], max_iter=100)
    assert int(iters_empty[0]) <= 1
