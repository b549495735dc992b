"""Pallas kernels vs their XLA reference implementations (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvn3d_tpu.ops.grouping import ball_query_multi
from pvn3d_tpu.ops.pallas.fps import fps_pallas
from pvn3d_tpu.ops.pallas.query import ball_query_pallas
from pvn3d_tpu.ops.sampling import _fps_xla


@pytest.mark.parametrize("n,m", [(256, 64), (1000, 128), (12288, 512)])
def test_fps_pallas_matches_xla(n, m):
    xyz = jax.random.normal(jax.random.PRNGKey(0), (3, n, 3))
    a = np.asarray(_fps_xla(xyz, m))
    b = np.asarray(fps_pallas(xyz, m, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_fps_pallas_zero_point_skip():
    # Points with ||p||^2 <= 1e-3 must never be selected (reference quirk,
    # sampling_gpu.cu:104-105).
    xyz = jax.random.normal(jax.random.PRNGKey(1), (2, 300, 3)) * 2.0
    xyz = xyz.at[:, 100:200].set(0.0)
    idx = np.asarray(fps_pallas(xyz, 64, interpret=True))
    assert not np.any((idx >= 100) & (idx < 200))
    a = np.asarray(_fps_xla(xyz, 64))
    np.testing.assert_array_equal(a, idx)


def test_fps_pallas_first_index_zero():
    xyz = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 3))
    idx = np.asarray(fps_pallas(xyz, 16, interpret=True))
    assert (idx[:, 0] == 0).all()


class TestBallQueryPallas:
    """Fused multi-scale ball query (ops/pallas/query.py): residue-class
    candidate extraction.  Exact when N <= 128 * capacity (every point is
    a candidate); on larger clouds every selected index must be in-radius
    (or the first-hit filler) and the neighbor-set recall must beat the
    approx path's 0.99 contract."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_small_n_exact(self, seed):
        rng = np.random.RandomState(seed)
        xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.2)
        cen = xyz[:, ::2]
        radii, ns = (0.15, 0.25), (8, 16)
        exact = ball_query_multi(radii, ns, xyz, cen, mode="exact")
        pal = ball_query_pallas(radii, ns, xyz, cen, capacity=2,
                                interpret=True)
        for e, p in zip(exact, pal):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    def test_in_radius_and_recall(self):
        # Random Gaussian cloud: the adversarial case for residue-class
        # collisions (clustered scanline runs are friendlier).
        rng = np.random.RandomState(0)
        n, m = 1536, 300            # m not a multiple of the 128-row tile
        xyz = rng.randn(1, n, 3).astype(np.float32) * 0.3
        cen = xyz[:, :m] + rng.randn(1, m, 3).astype(np.float32) * 0.01
        radius, ns = 0.2, 32
        exact = ball_query_multi((radius,), (ns,), jnp.asarray(xyz),
                                 jnp.asarray(cen), mode="exact")[0]
        pal = ball_query_pallas((radius,), (ns,), jnp.asarray(xyz),
                                jnp.asarray(cen), capacity=2,
                                interpret=True)[0]
        e, p = np.asarray(exact), np.asarray(pal)
        d2 = np.sum((xyz[0][p[0]] - cen[0][:, None]) ** 2, -1)
        first = p[0, :, :1]
        in_radius = d2 < radius * radius
        assert np.all(in_radius | (p[0] == first)), \
            "filler slots may only repeat the first hit"
        recall = np.mean([
            len(set(p[0, i]) & set(e[0, i])) / len(set(e[0, i]))
            for i in range(m)])
        assert recall >= 0.99, recall

    def test_no_hit_gets_zero(self):
        xyz = jnp.asarray(np.random.RandomState(0)
                          .randn(1, 384, 3).astype(np.float32))
        far = jnp.full((1, 8, 3), 50.0, jnp.float32)
        out = ball_query_pallas((0.1,), (8,), xyz, far, interpret=True)[0]
        assert (np.asarray(out) == 0).all()

    def test_matches_grouping_mode_pallas(self):
        # grouping.ball_query_multi(mode="pallas") routes to the kernel
        # (interpret mode off-TPU) and must agree with the direct call.
        rng = np.random.RandomState(3)
        xyz = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32) * 0.2)
        cen = xyz[:, ::4]
        radii, ns = (0.1, 0.2), (8, 16)
        via_mode = ball_query_multi(radii, ns, xyz, cen, mode="pallas")
        direct = ball_query_pallas(radii, ns, xyz, cen, interpret=True)
        for a, b in zip(via_mode, direct):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestThreeInterpolateFused:
    """Fused 3-NN IDW kernel (ops/pallas/interp.py) vs the XLA exact path
    (ops/interpolate.py) and the CUDA running-min tie order."""

    def _ref(self, u, k, f):
        from pvn3d_tpu.ops.interpolate import (idw_weights, three_interpolate,
                                               three_nn)
        dist, idx = three_nn(u, k, mode="exact")
        w = idw_weights(dist)
        return three_interpolate(f.astype(jnp.float32), idx, w), dist, idx

    @pytest.mark.parametrize("n,m,c", [(300, 96, 64), (512, 128, 32)])
    def test_matches_exact_path(self, n, m, c):
        from pvn3d_tpu.ops.pallas.interp import three_interpolate_fused
        rng = np.random.RandomState(0)
        u = jnp.asarray(rng.randn(2, n, 3).astype(np.float32))
        k = jnp.asarray(rng.randn(2, m, 3).astype(np.float32))
        f = jnp.asarray(rng.randn(2, m, c).astype(np.float32))
        out, dist, idx = three_interpolate_fused(u, k, f, 1e-8, True)
        ref_out, ref_dist, ref_idx = self._ref(u, k, f)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_allclose(np.asarray(dist), np.asarray(ref_dist),
                                   atol=1e-5)
        # The kernel's direct-form d^2 (VPU) and the XLA oracle's expanded
        # form differ at the f32 rounding level; a near-zero nearest
        # distance amplifies that into ~1e-4 relative IDW-weight noise
        # (1/d weighting).  The direct form is the closer one to f64.
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-3, atol=2e-4)

    def test_tie_order_matches_cuda_running_min(self):
        # Duplicate known points force exact distance ties: the reference
        # running min keeps both, earlier index first.
        from pvn3d_tpu.ops.pallas.interp import three_interpolate_fused
        k = np.zeros((1, 5, 3), np.float32)
        k[0, 1] = [1.0, 0, 0]
        k[0, 3] = [1.0, 0, 0]          # tie with index 1
        k[0, 2] = [2.0, 0, 0]
        k[0, 4] = [3.0, 0, 0]
        u = np.zeros((1, 1, 3), np.float32)
        u[0, 0] = [1.0, 0, 0]          # dists: 1,0,1,0,2 -> idx 1,3,0
        f = np.arange(5, dtype=np.float32).reshape(1, 5, 1)
        _, dist, idx = three_interpolate_fused(
            jnp.asarray(u), jnp.asarray(k), jnp.asarray(f), 1e-8, True)
        np.testing.assert_array_equal(np.asarray(idx)[0, 0], [1, 3, 0])
        np.testing.assert_allclose(np.asarray(dist)[0, 0], [0, 0, 1],
                                   atol=1e-6)

    def test_fewer_than_three_known_points(self):
        # m < 3: the padded extraction rounds must return index 0 with a
        # huge distance (the CUDA running-min's initialized slots), never
        # an out-of-range index.
        from pvn3d_tpu.ops.pallas.interp import three_interpolate_fused
        k = np.asarray([[[0.0, 0, 0], [1.0, 0, 0]]], np.float32)  # m = 2
        u = np.asarray([[[0.1, 0, 0], [0.9, 0, 0]]], np.float32)
        f = np.asarray([[[10.0], [20.0]]], np.float32)
        out, dist, idx = three_interpolate_fused(
            jnp.asarray(u), jnp.asarray(k), jnp.asarray(f), 1e-8, True)
        idx = np.asarray(idx)
        assert idx.min() >= 0 and idx.max() < 2
        np.testing.assert_array_equal(idx[0, :, 2], [0, 0])   # padded slot
        assert np.all(np.asarray(dist)[0, :, 2] > 1e10)       # huge dist
        # Weight on the padded slot ~ 0: blend == IDW of the two real pts
        # (dists 0.1/0.9 -> weights 0.9/0.1 -> 10*0.9 + 20*0.1 = 11).
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 11.0, atol=1e-3)

    def test_gradient_matches_xla(self):
        from pvn3d_tpu.ops.pallas.interp import three_interpolate_fused
        from pvn3d_tpu.ops.interpolate import (idw_weights, three_interpolate,
                                               three_nn)
        rng = np.random.RandomState(1)
        u = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 40, 3).astype(np.float32))
        f = jnp.asarray(rng.randn(1, 40, 16).astype(np.float32))

        def loss_fused(feat):
            out, _, _ = three_interpolate_fused(u, k, feat, 1e-8, True)
            return jnp.sum(out * out)

        def loss_xla(feat):
            dist, idx = three_nn(u, k, mode="exact")
            out = three_interpolate(feat, idx, idw_weights(dist))
            return jnp.sum(out * out)

        g_fused = jax.grad(loss_fused)(f)
        g_xla = jax.grad(loss_xla)(f)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                                   rtol=2e-5, atol=2e-5)

    def test_coordinate_grads_are_zero(self):
        from pvn3d_tpu.ops.pallas.interp import three_interpolate_fused
        rng = np.random.RandomState(2)
        u = jnp.asarray(rng.randn(1, 16, 3).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 8, 3).astype(np.float32))
        f = jnp.asarray(rng.randn(1, 8, 4).astype(np.float32))
        g = jax.grad(lambda uu: jnp.sum(
            three_interpolate_fused(uu, k, f, 1e-8, True)[0]))(u)
        assert (np.asarray(g) == 0).all()


def _winner_oracle_direct(pts, msk, bw):
    """Numpy f32 oracle in the kernel's exact arithmetic: direct
    (a_i - a_j)^2 distances accumulated coordinate-by-coordinate (the
    same f32 operation order as the VPU sweeps), so win/labels/counts
    must be BIT-identical to the fused kernel."""
    pts = np.asarray(pts, np.float32)
    msk = np.asarray(msk)
    h, k, _ = pts.shape
    wins = np.zeros(h, np.int32)
    labels = np.zeros((h, k), bool)
    counts = np.zeros(h, np.int32)
    for i in range(h):
        d2 = np.zeros((k, k), np.float32)
        for c in range(3):
            diff = pts[i, :, c:c + 1] - pts[i, :, c:c + 1].T
            d2 = d2 + diff * diff
        in_bw = (d2 < np.float32(bw * bw)) & msk[i][None, :] & msk[i][:, None]
        num_in = in_bw.sum(-1).astype(np.int32)
        wins[i] = np.argmax(num_in)
        labels[i] = in_bw[wins[i]]
        counts[i] = num_in[wins[i]]
    return wins, labels, counts


class TestWinnerStatsFused:
    """Fused MeanShift winner pass (ops/pallas/winner.py).

    Primary oracle: a numpy f32 replica of the kernel's direct-form d^2
    (bit-identical contract).  The production XLA fallback
    (`_winner_stats(impl="xla")`) uses the expanded |a|^2-2ab+|b|^2 form,
    whose cancellation can flip membership for points within f32
    rounding of the bandwidth boundary — the cross-check therefore only
    requires agreement when no pair sits in that ambiguity window."""

    @pytest.mark.parametrize("h,k", [(8, 512), (21, 512), (5, 200)])
    def test_matches_direct_oracle(self, h, k):
        from pvn3d_tpu.ops.pallas.winner import winner_stats_fused
        rng = np.random.RandomState(h * 100 + k)
        pts = jnp.asarray(0.05 * rng.randn(h, k, 3).astype(np.float32))
        msk = jnp.asarray(rng.rand(h, k) < 0.8)
        ow, ol, oc = _winner_oracle_direct(pts, msk, 0.08)
        fw, fl, fc = winner_stats_fused(pts, msk, 0.08, interpret=True)
        np.testing.assert_array_equal(ow, np.asarray(fw))
        np.testing.assert_array_equal(ol, np.asarray(fl))
        np.testing.assert_array_equal(oc, np.asarray(fc))

    @pytest.mark.parametrize("h,k", [(8, 512), (5, 200)])
    def test_matches_xla_outside_boundary_window(self, h, k):
        from pvn3d_tpu.inference.meanshift import _winner_stats
        from pvn3d_tpu.ops.pallas.winner import winner_stats_fused
        rng = np.random.RandomState(h * 100 + k)
        pts = 0.05 * rng.randn(h, k, 3).astype(np.float32)
        msk = rng.rand(h, k) < 0.8
        bw = 0.08
        d2 = np.sum((pts[:, :, None, :].astype(np.float64)
                     - pts[:, None, :, :]) ** 2, -1)
        clean = ~np.any(np.abs(d2 - bw * bw) < 1e-5 * bw * bw,
                        axis=(1, 2))                 # (h,) no boundary pair
        assert clean.any(), "every hypothesis landed on the boundary?!"
        ow, ol, oc = _winner_stats(jnp.asarray(pts), jnp.asarray(msk),
                                   bw, 4, impl="xla")
        fw, fl, fc = winner_stats_fused(jnp.asarray(pts), jnp.asarray(msk),
                                        bw, interpret=True)
        np.testing.assert_array_equal(np.asarray(ow)[clean],
                                      np.asarray(fw)[clean])
        np.testing.assert_array_equal(np.asarray(ol)[clean],
                                      np.asarray(fl)[clean])
        np.testing.assert_array_equal(np.asarray(oc)[clean],
                                      np.asarray(fc)[clean])

    def test_all_invalid_hypothesis(self):
        from pvn3d_tpu.ops.pallas.winner import winner_stats_fused
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(3, 130, 3).astype(np.float32))
        msk = jnp.zeros((3, 130), bool).at[1].set(
            jnp.asarray(rng.rand(130) < 0.5))
        ow, ol, oc = _winner_oracle_direct(pts, msk, 0.08)
        fw, fl, fc = winner_stats_fused(pts, msk, 0.08, interpret=True)
        np.testing.assert_array_equal(ow, np.asarray(fw))
        np.testing.assert_array_equal(ol, np.asarray(fl))
        np.testing.assert_array_equal(oc, np.asarray(fc))


@pytest.mark.parametrize("b", [1, 2, 7, 8, 17])
def test_fps_pallas_batch_layouts(b):
    """Every dispatch tier of fps_pallas matches the XLA reference:
    b <= 2 takes the wide sublane-folded layout (b=2 is the production
    B=2 path since the round-4 crossover fix), b in 3..16 the row-major
    single-program kernel, and b > 16 the grid path (ops/pallas/fps.py
    dispatch thresholds)."""
    xyz = jax.random.normal(jax.random.PRNGKey(3), (b, 640, 3))
    a = np.asarray(_fps_xla(xyz, 96))
    got = np.asarray(fps_pallas(xyz, 96, interpret=True))
    np.testing.assert_array_equal(a, got)
