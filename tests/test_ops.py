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

    def test_approx_never_admits_far_points(self):
        """Every index a query returns must be in-radius (or the 0
        no-hit sentinel): approx_min_k filler slots (score n) are masked
        to the first hit, never clamped to point n-1
        (ops/grouping.py ``found``; VERDICT r1 weak #4)."""
        rng = np.random.RandomState(3)
        xyz = rng.uniform(-1, 1, (1, 512, 3)).astype(np.float32)
        xyz[0, -1] = 50.0          # the would-be clamp target, far away
        cen = xyz[0, rng.choice(511, 64, replace=False)][None]
        for nsample in (4, 64):    # under- and over-subscribed balls
            idx = np.asarray(ball_query(0.3, nsample, xyz, cen,
                                        mode="approx"))[0]
            d = np.linalg.norm(xyz[0][idx] - cen[0][:, None], axis=-1)
            hit_any = (np.linalg.norm(
                xyz[0][None, :] - cen[0][:, None], axis=-1) < 0.3).any(1)
            ok = (d < 0.3) | (~hit_any[:, None] & (idx == 0))
            assert ok.all()

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


class TestGroupedFPS:
    """Sharded FPS (ops/sampling.py::_fps_grouped): G parallel chains of
    m/G steps over strided interleaved subsets.  Not bit-parity with the
    serial reference — these pin structure + spatial coverage."""

    def _scene(self, seed=0, n=2048):
        # plane + blobs in scanline-ish order: the dense realistic layout
        # the approx ball-query fidelity was measured on (CLAUDE.md).
        rng = np.random.RandomState(seed)
        g = int(np.sqrt(n * 2 // 3))
        u, v = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g))
        plane = np.stack([u.ravel(), v.ravel(),
                          1.0 + 0.05 * u.ravel()], 1)
        blobs = np.concatenate([
            c + 0.08 * rng.randn(200, 3)
            for c in ([0.3, 0.2, 0.9], [-0.4, -0.1, 1.1], [0.0, 0.5, 1.0])])
        pts = np.concatenate([plane, blobs])[:n].astype(np.float32)
        return pts[None]

    @staticmethod
    def _coverage(xyz, idx):
        """max over points of distance to the nearest selected point —
        lower is better; the quantity FPS greedily minimizes."""
        sel = xyz[0, np.asarray(idx)[0]]
        d = np.linalg.norm(xyz[0][:, None] - sel[None], axis=-1)
        return float(d.min(1).max())

    def test_structure(self):
        xyz = self._scene()
        idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 256,
                                               use_pallas=False, groups=8))
        assert idx.shape == (1, 256)
        assert len(np.unique(idx[0])) == 256        # disjoint slabs
        # every slab contributes exactly m/G picks: the sorted positions
        # of the picks tile the G equal-count chunks.
        key = xyz[0, :, np.argmax(xyz[0].max(0) - xyz[0].min(0))]
        rank = np.argsort(np.argsort(key, kind="stable"))
        chunks = rank[idx[0]] // (xyz.shape[1] // 8)
        assert np.bincount(chunks, minlength=8).tolist() == [32] * 8

    def test_coverage_near_exact(self):
        xyz = self._scene()
        exact = furthest_point_sample(jnp.asarray(xyz), 256,
                                      use_pallas=False)
        rho_exact = self._coverage(xyz, exact)
        for g in (4, 8):
            grouped = furthest_point_sample(jnp.asarray(xyz), 256,
                                            use_pallas=False, groups=g)
            rho = self._coverage(xyz, grouped)
            # slab partition measured ~1.12x greedy-exact covering radius
            # on this scene family (strided grouping measured 2x)
            assert rho <= 1.3 * rho_exact, (g, rho, rho_exact)

    def test_indivisible_raises(self):
        xyz = jnp.asarray(self._scene(n=2048))
        with pytest.raises(ValueError):
            furthest_point_sample(xyz, 100, use_pallas=False, groups=8)

    def test_groups_one_is_exact(self):
        xyz = jnp.asarray(self._scene())
        a = furthest_point_sample(xyz, 64, use_pallas=False)
        b = furthest_point_sample(xyz, 64, use_pallas=False, groups=1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFPSPrefix:
    """Greedy FPS is prefix-consistent: FPS over the pick-ordered output
    of a previous FPS (seed = its index 0) selects exactly rows
    [0, npoint).  This is the property that lets SA levels 1..3 slice
    instead of re-running their serial chains
    (models/pointnet2.py::SetAbstractionMSG.fps_prefix)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_refps_of_fps_output_is_arange(self, seed):
        rng = np.random.RandomState(seed)
        xyz = jnp.asarray(rng.uniform(-1, 1, (2, 512, 3)).astype(np.float32))
        idx0 = furthest_point_sample(xyz, 128, use_pallas=False)
        sampled = gather_points(xyz, idx0)          # pick order
        for m in (64, 16):
            idx1 = np.asarray(furthest_point_sample(sampled, m,
                                                    use_pallas=False))
            np.testing.assert_array_equal(
                idx1, np.tile(np.arange(m, dtype=np.int32), (2, 1)))

    def test_oracle_agrees(self):
        """The same property against the pure-numpy reference oracle."""
        rng = np.random.RandomState(7)
        xyz = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
        order = np_fps(xyz, 64)
        sub = np_fps(xyz[order], 32)
        np.testing.assert_array_equal(sub, np.arange(32))
