"""Golden + property tests for the SE(3)/metrics core.

Mirrors the only real correctness test in the reference
(lib/utils/icp/test.py: random rotation/translation roundtrips through
best_fit_transform) plus numpy oracles for the metric definitions.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvn3d_tpu.geometry import (
    best_fit_transform, transform_points, cal_add, cal_adds, cal_auc,
    voc_ap, add_accuracy_at,
)
from pvn3d_tpu.geometry.se3 import identity_pose, random_pose


def np_best_fit_transform(a, b):
    """Numpy oracle with the reference's exact algorithm
    (basic_utils.py:47-80)."""
    m = a.shape[1]
    ca, cb = a.mean(0), b.mean(0)
    aa, bb = a - ca, b - cb
    h = aa.T @ bb
    u, s, vt = np.linalg.svd(h)
    r = vt.T @ u.T
    if np.linalg.det(r) < 0:
        vt[m - 1, :] *= -1
        r = vt.T @ u.T
    t = cb.T - r @ ca.T
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = r
    out[:, 3] = t
    return out


class TestBestFitTransform:
    def test_exact_roundtrip(self):
        key = jax.random.PRNGKey(0)
        for i in range(5):
            key, k1, k2 = jax.random.split(key, 3)
            pose = random_pose(k1)
            src = jax.random.normal(k2, (16, 3))
            dst = transform_points(pose, src)
            fit = best_fit_transform(src, dst)
            np.testing.assert_allclose(np.asarray(fit), np.asarray(pose),
                                       atol=1e-5)

    def test_matches_numpy_oracle_noisy(self):
        rng = np.random.RandomState(1)
        for _ in range(5):
            a = rng.randn(9, 3).astype(np.float32)
            b = rng.randn(9, 3).astype(np.float32)
            ours = np.asarray(best_fit_transform(a, b))
            ref = np_best_fit_transform(a, b)
            np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_reflection_case(self):
        # Degenerate/planar correspondences can produce det < 0 without the
        # fix; the result must still be a proper rotation.
        rng = np.random.RandomState(2)
        a = rng.randn(8, 3).astype(np.float32)
        a[:, 2] = 0.0
        b = a.copy()
        b[:, 0] *= -1.0  # mirrored
        fit = np.asarray(best_fit_transform(a, b))
        assert np.linalg.det(fit[:, :3]) > 0.99

    def test_batched(self):
        key = jax.random.PRNGKey(3)
        poses = jnp.stack([random_pose(k) for k in jax.random.split(key, 4)])
        src = jax.random.normal(jax.random.PRNGKey(4), (4, 10, 3))
        dst = transform_points(poses, src)
        fit = best_fit_transform(src, dst)
        np.testing.assert_allclose(np.asarray(fit), np.asarray(poses),
                                   atol=1e-5)

    def test_weighted_ignores_padding(self):
        key = jax.random.PRNGKey(5)
        pose = random_pose(key)
        src = jax.random.normal(jax.random.PRNGKey(6), (12, 3))
        dst = transform_points(pose, src)
        # Corrupt the last 4 points but zero their weight.
        dst = dst.at[8:].set(999.0)
        w = jnp.array([1.0] * 8 + [0.0] * 4)
        fit = best_fit_transform(src, dst, weights=w)
        np.testing.assert_allclose(np.asarray(fit), np.asarray(pose),
                                   atol=1e-4)


class TestMetrics:
    def _setup(self, n=64, seed=0):
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        pts = jax.random.normal(k1, (n, 3)) * 0.05
        gt = random_pose(k2, max_trans=0.5)
        pred = random_pose(k3, max_trans=0.5)
        return pts, gt, pred

    def test_add_oracle(self):
        pts, gt, pred = self._setup()
        ours = float(cal_add(pred, gt, pts))
        p = np.asarray(transform_points(pred, pts))
        g = np.asarray(transform_points(gt, pts))
        ref = np.linalg.norm(p - g, axis=1).mean()
        assert abs(ours - ref) < 1e-5

    def test_adds_oracle(self):
        pts, gt, pred = self._setup(n=100)
        ours = float(cal_adds(pred, gt, pts, chunk=32))
        p = np.asarray(transform_points(pred, pts))
        g = np.asarray(transform_points(gt, pts))
        d = np.linalg.norm(g[:, None, :] - p[None, :, :], axis=2)
        ref = d.min(axis=1).mean()
        assert abs(ours - ref) < 1e-4

    def test_adds_leq_add(self):
        pts, gt, pred = self._setup(n=80, seed=7)
        assert float(cal_adds(pred, gt, pts)) <= float(cal_add(pred, gt, pts)) + 1e-5

    def test_identical_pose_zero(self):
        pts, gt, _ = self._setup()
        assert float(cal_add(gt, gt, pts)) < 1e-6
        assert float(cal_adds(gt, gt, pts)) < 1e-4

    def test_adds_masked_padding(self):
        pts, gt, pred = self._setup(n=50)
        pad = jnp.concatenate([pts, jnp.full((14, 3), 1e6)], axis=0)
        mask = jnp.array([1.0] * 50 + [0.0] * 14)
        ours = float(cal_adds(pred, gt, pad, mask=mask, chunk=16))
        ref = float(cal_adds(pred, gt, pts, chunk=64))
        assert abs(ours - ref) < 1e-4

    def test_auc_extremes(self):
        assert cal_auc([0.0] * 100) == pytest.approx(100.0)
        assert cal_auc([1.0] * 100) == pytest.approx(0.0)
        assert cal_auc([]) == 0.0

    def test_auc_half(self):
        # Half the frames at ~0 distance, half beyond threshold.
        dis = [1e-9] * 50 + [0.5] * 50
        auc = cal_auc(dis)
        assert 49.0 < auc < 51.0

    def test_auc_monotone_in_quality(self):
        rng = np.random.RandomState(0)
        good = rng.uniform(0, 0.02, 200)
        bad = rng.uniform(0, 0.2, 200)
        assert cal_auc(good) > cal_auc(bad)

    def test_accuracy_at(self):
        assert add_accuracy_at([0.01, 0.02, 0.5, 0.9], 0.1) == 50.0
        assert add_accuracy_at([], 0.1) == 0.0

    def test_voc_ap_all_inf(self):
        assert voc_ap(np.array([np.inf, np.inf]), np.array([0.5, 1.0])) == 0.0


class TestCloud:
    def test_unproject_project_roundtrip(self):
        from pvn3d_tpu.geometry import depth_to_cloud, project_points
        from pvn3d_tpu import config as C
        rng = np.random.RandomState(0)
        k = C.INTRINSICS["ycb_K1"]
        depth = np.zeros((480, 640), np.float32)
        rows = rng.randint(0, 480, 200)
        cols = rng.randint(0, 640, 200)
        depth[rows, cols] = rng.uniform(0.5, 2.0, 200).astype(np.float32)
        cld, choose = depth_to_cloud(depth, k)
        assert cld.shape[0] == choose.shape[0] == (depth > 0).sum()
        uv = np.asarray(project_points(jnp.asarray(cld), jnp.asarray(k)))
        exp_col = choose % 640
        exp_row = choose // 640
        np.testing.assert_array_equal(uv[:, 0], exp_col)
        np.testing.assert_array_equal(uv[:, 1], exp_row)

    def test_cloud_map_matches_host(self):
        from pvn3d_tpu.geometry import depth_to_cloud, depth_to_cloud_map
        from pvn3d_tpu import config as C
        rng = np.random.RandomState(1)
        k = C.INTRINSICS["linemod"]
        depth = rng.uniform(0.0, 2.0, (48, 64)).astype(np.float32)
        depth[depth < 1.0] = 0.0
        cld, choose = depth_to_cloud(depth, k)
        cmap, valid = depth_to_cloud_map(jnp.asarray(depth), jnp.asarray(k))
        cmap = np.asarray(cmap).reshape(-1, 3)
        np.testing.assert_allclose(cmap[choose], cld, atol=1e-5)
        assert np.asarray(valid).sum() == len(choose)


def test_identity_pose_shape():
    p = identity_pose((2, 3))
    assert p.shape == (2, 3, 3, 4)
    np.testing.assert_allclose(np.asarray(p[0, 0, :, :3]), np.eye(3))
