"""Kernel-level golden tests of the point-op suite vs numpy oracles.

The oracles reimplement the reference CUDA semantics exactly, including edge
cases: FPS seed = index 0 and the zero-point skip (sampling_gpu.cu:92-110),
ball query's in-order first-k with pad-by-first-hit (ball_query_gpu.cu:26-43),
and three_nn's ascending-order top-3 (interpolate_gpu.cu:8-68).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvn3d_tpu.ops import (
    furthest_point_sample, gather_points, ball_query, group_points,
    query_and_group, three_nn, three_interpolate,
)
from pvn3d_tpu.ops.interpolate import idw_weights


# ----------------------------- numpy oracles ------------------------------

def np_fps(xyz, m):
    """Reference FPS semantics (sampling_gpu.cu:92-110)."""
    n = xyz.shape[0]
    mag = (xyz ** 2).sum(1)
    skip = mag <= 1e-3
    idxs = np.zeros(m, np.int32)
    mindist = np.full(n, 1e10, np.float32)
    last = 0
    for i in range(1, m):
        d = ((xyz - xyz[last]) ** 2).sum(1)
        upd = ~skip
        mindist[upd] = np.minimum(mindist[upd], d[upd])
        cand = np.where(skip, -np.inf, mindist)
        last = int(np.argmax(cand))
        idxs[i] = last
    return idxs


def np_ball_query(radius, ns, xyz, centroids):
    """Reference ball query semantics (ball_query_gpu.cu:26-43)."""
    m = centroids.shape[0]
    out = np.zeros((m, ns), np.int32)
    r2 = radius * radius
    for i in range(m):
        cnt = 0
        for j in range(xyz.shape[0]):
            d2 = ((centroids[i] - xyz[j]) ** 2).sum()
            if d2 < r2:
                if cnt == 0:
                    out[i, :] = j
                out[i, cnt] = j
                cnt += 1
                if cnt >= ns:
                    break
    return out


def np_three_nn(unknown, known):
    d = np.linalg.norm(unknown[:, None, :] - known[None, :, :], axis=2)
    idx = np.argsort(d, axis=1)[:, :3]
    dist = np.take_along_axis(d, idx, axis=1)
    return dist, idx


# --------------------------------- tests ----------------------------------

class TestFPS:
    def test_matches_oracle(self):
        rng = np.random.RandomState(0)
        xyz = rng.randn(64, 3).astype(np.float32)
        ours = np.asarray(furthest_point_sample(xyz[None], 16))[0]
        ref = np_fps(xyz, 16)
        np.testing.assert_array_equal(ours, ref)

    def test_zero_points_skipped(self):
        rng = np.random.RandomState(1)
        xyz = rng.randn(32, 3).astype(np.float32) + 5.0
        xyz[5] = 0.0   # must never be selected despite being "far"
        xyz[17] = 0.01
        ours = np.asarray(furthest_point_sample(xyz[None], 8))[0]
        assert 5 not in ours[1:]
        assert 17 not in ours[1:]
        np.testing.assert_array_equal(ours, np_fps(xyz, 8))

    def test_first_index_zero_and_unique(self):
        rng = np.random.RandomState(2)
        xyz = rng.randn(128, 3).astype(np.float32)
        ours = np.asarray(furthest_point_sample(xyz[None], 32))[0]
        assert ours[0] == 0
        assert len(set(ours.tolist())) == 32

    def test_batched(self):
        rng = np.random.RandomState(3)
        xyz = rng.randn(3, 50, 3).astype(np.float32)
        ours = np.asarray(furthest_point_sample(xyz, 10))
        for b in range(3):
            np.testing.assert_array_equal(ours[b], np_fps(xyz[b], 10))

    def test_spread(self):
        # FPS should cover the cube better than the first-m prefix.
        rng = np.random.RandomState(4)
        xyz = rng.uniform(1, 2, (256, 3)).astype(np.float32)
        idx = np.asarray(furthest_point_sample(xyz[None], 16))[0]
        sel = xyz[idx]

        def min_pairwise(a):
            d = np.linalg.norm(a[:, None] - a[None, :], axis=2)
            d[np.diag_indices(len(a))] = np.inf
            return d.min()

        assert min_pairwise(sel) > min_pairwise(xyz[:16])


class TestGather:
    def test_gather(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(2, 20, 5).astype(np.float32)
        idx = rng.randint(0, 20, (2, 7)).astype(np.int32)
        out = np.asarray(gather_points(pts, idx))
        for b in range(2):
            np.testing.assert_allclose(out[b], pts[b, idx[b]])

    def test_gather_grad_is_scatter_add(self):
        pts = jnp.arange(12.0).reshape(1, 6, 2)
        idx = jnp.array([[1, 1, 3]], dtype=jnp.int32)
        g = jax.grad(lambda p: gather_points(p, idx).sum())(pts)
        expected = np.zeros((1, 6, 2))
        expected[0, 1] = 2.0   # gathered twice
        expected[0, 3] = 1.0
        np.testing.assert_allclose(np.asarray(g), expected)


class TestBallQuery:
    @pytest.mark.parametrize("chunk_m", [4, 64])
    def test_matches_oracle(self, chunk_m):
        rng = np.random.RandomState(0)
        xyz = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        cen = xyz[rng.choice(100, 10, replace=False)]
        ours = np.asarray(
            ball_query(0.5, 8, xyz[None], cen[None], chunk_m=chunk_m))[0]
        ref = np_ball_query(0.5, 8, xyz, cen)
        np.testing.assert_array_equal(ours, ref)

    def test_empty_ball_gives_zeros(self):
        xyz = np.ones((1, 10, 3), np.float32) * 5
        cen = np.zeros((1, 2, 3), np.float32)
        ours = np.asarray(ball_query(0.1, 4, xyz, cen))
        np.testing.assert_array_equal(ours, 0)

    def test_pad_with_first_hit(self):
        xyz = np.zeros((1, 6, 3), np.float32)
        xyz[0, 3] = [0.01, 0, 0]   # only point near the centroid... plus pads
        xyz[0, :3] = 10.0
        xyz[0, 4:] = 10.0
        cen = np.zeros((1, 1, 3), np.float32)
        ours = np.asarray(ball_query(0.1, 4, xyz, cen))[0, 0]
        np.testing.assert_array_equal(ours, [3, 3, 3, 3])

    def test_strict_inequality(self):
        # d^2 == r^2 must NOT qualify (ball_query_gpu.cu:34 uses <).
        xyz = np.array([[[0.5, 0, 0]]], np.float32)
        cen = np.zeros((1, 1, 3), np.float32)
        ours = np.asarray(ball_query(0.5, 2, xyz, cen))
        np.testing.assert_array_equal(ours, 0)

    def test_chunk_boundary_ordering(self):
        # Hits spanning selection chunks must keep global index order.
        xyz = np.zeros((1, 40, 3), np.float32)
        xyz[0, :, 0] = np.linspace(0, 0.05, 40)
        cen = np.zeros((1, 1, 3), np.float32)
        ours = np.asarray(ball_query(1.0, 40, xyz, cen))[0, 0]
        np.testing.assert_array_equal(ours, np.arange(40))


class TestGrouping:
    def test_group_points(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(2, 30, 4).astype(np.float32)
        idx = rng.randint(0, 30, (2, 5, 3)).astype(np.int32)
        out = np.asarray(group_points(pts, idx))
        for b in range(2):
            for i in range(5):
                np.testing.assert_allclose(out[b, i], pts[b, idx[b, i]])

    def test_query_and_group_centered(self):
        rng = np.random.RandomState(1)
        xyz = rng.uniform(-1, 1, (1, 50, 3)).astype(np.float32)
        feat = rng.randn(1, 50, 6).astype(np.float32)
        cen = xyz[:, :4]
        out = np.asarray(query_and_group(0.6, 8, xyz, cen, feat))
        assert out.shape == (1, 4, 8, 9)
        idx = np.asarray(ball_query(0.6, 8, xyz, cen))[0]
        for i in range(4):
            np.testing.assert_allclose(
                out[0, i, :, :3], xyz[0, idx[i]] - cen[0, i], atol=1e-6)
            np.testing.assert_allclose(out[0, i, :, 3:], feat[0, idx[i]])

    def test_group_grad(self):
        pts = jnp.ones((1, 8, 2))
        idx = jnp.zeros((1, 2, 3), jnp.int32)
        g = jax.grad(lambda p: group_points(p, idx).sum())(pts)
        assert float(g[0, 0, 0]) == 6.0
        assert float(g[0, 1, 0]) == 0.0


class TestInterpolate:
    def test_three_nn_oracle(self):
        rng = np.random.RandomState(0)
        unknown = rng.randn(40, 3).astype(np.float32)
        known = rng.randn(12, 3).astype(np.float32)
        dist, idx = three_nn(unknown[None], known[None], chunk=16)
        rdist, ridx = np_three_nn(unknown, known)
        np.testing.assert_allclose(np.asarray(dist)[0], rdist, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx)[0], ridx)

    def test_interpolate_exact_at_known_points(self):
        # Interpolating at the known points themselves returns their features.
        rng = np.random.RandomState(1)
        known = rng.randn(10, 3).astype(np.float32)
        feats = rng.randn(10, 4).astype(np.float32)
        dist, idx = three_nn(known[None], known[None])
        w = idw_weights(dist)
        out = np.asarray(three_interpolate(feats[None], idx, w))[0]
        np.testing.assert_allclose(out, feats, atol=1e-4)

    def test_idw_weights_normalized(self):
        d = jnp.array([[[0.1, 0.2, 0.4]]])
        w = np.asarray(idw_weights(d))
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)
        assert w[0, 0, 0] > w[0, 0, 1] > w[0, 0, 2]

    def test_interpolate_grad(self):
        feats = jnp.ones((1, 5, 2))
        idx = jnp.zeros((1, 3, 3), jnp.int32)
        w = jnp.full((1, 3, 3), 1.0 / 3)
        g = jax.grad(lambda f: three_interpolate(f, idx, w).sum())(feats)
        np.testing.assert_allclose(float(g[0, 0, 0]), 3.0, atol=1e-6)


class TestBallQueryMulti:
    def test_matches_single_scale_queries(self):
        from pvn3d_tpu.ops.grouping import ball_query_multi
        rng = np.random.RandomState(0)
        xyz = rng.uniform(-1, 1, (2, 200, 3)).astype(np.float32)
        cen = xyz[:, :40]
        multi = ball_query_multi((0.3, 0.6), (4, 8), xyz, cen)
        for radius, ns, got in zip((0.3, 0.6), (4, 8), multi):
            want = np.asarray(ball_query(radius, ns, xyz, cen))
            np.testing.assert_array_equal(np.asarray(got), want)
