"""Native C++ preprocessing (native/preprocess.cpp) vs the numpy oracles.

The numpy implementations in data/depth_completion.py and data/normals.py
are the behavioral contracts (themselves oracle-tested against the
reference algorithm); the native twins must reproduce them to float
tolerance.  The only intentionally-inexact stage is the bilateral filter
(exact exp instead of cv2's 4096-bin LUT — O(1e-6) differences).
"""
import numpy as np
import pytest

from pvn3d_tpu.data import depth_completion as dc
from pvn3d_tpu.data.normals import normals_from_depth_map
from pvn3d_tpu.native import preprocess as natp

pytestmark = pytest.mark.skipif(natp.load_library() is None,
                                reason="no C++ toolchain")


def _depth_frame(seed=0, h=120, w=160, hole_frac=0.25):
    """Sloped plane + blob with holes — scanline structure like a sensor."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d = 0.8 + 0.6 * ys / h + 0.2 * xs / w
    blob = ((ys - h / 2) ** 2 + (xs - w / 2) ** 2) < (min(h, w) / 4) ** 2
    d = np.where(blob, d - 0.3, d) + rng.randn(h, w).astype(np.float32) * 0.003
    d[rng.rand(h, w) < hole_frac] = 0.0
    return d


class TestFillMultiscale:
    @pytest.mark.parametrize("seed,extrapolate", [(0, False), (1, False),
                                                  (2, True)])
    def test_matches_numpy(self, seed, extrapolate):
        d = _depth_frame(seed)
        ref = dc.fill_in_multiscale(d.copy(), extrapolate=extrapolate)
        out = natp.fill_in_multiscale_native(d.copy(),
                                             extrapolate=extrapolate)
        # Everything except the bilateral stage is bit-exact arithmetic;
        # the LUT-free bilateral differs O(1e-6) on smoothed pixels.
        np.testing.assert_allclose(out, ref, atol=1e-4)
        assert np.mean(np.abs(out - ref)) < 1e-6

    def test_blur_none_exact(self):
        d = _depth_frame(3)
        ref = dc.fill_in_multiscale(d.copy(), blur_type="none")
        out = natp.fill_in_multiscale_native(d.copy(), blur_type="none")
        np.testing.assert_array_equal(out, ref)

    def test_gaussian_falls_back(self):
        assert natp.fill_in_multiscale_native(_depth_frame(0),
                                              blur_type="gaussian") is None

    def test_fill_missing_dispatch(self):
        d = _depth_frame(4)
        auto = dc.fill_missing(d.copy(), cam_scale=1000.0)
        forced = dc.fill_missing(d.copy(), cam_scale=1000.0, impl="numpy")
        np.testing.assert_allclose(auto, forced, atol=1e-4)


class TestNormals:
    K = np.array([[280.0, 0, 80.0], [0, 281.0, 60.0], [0, 0, 1]], np.float32)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_numpy(self, seed):
        d = _depth_frame(seed)
        filled = dc.fill_in_multiscale(d.copy())
        ref = normals_from_depth_map(filled, self.K, impl="numpy")
        out = natp.normals_from_depth_map_native(filled, self.K)
        # f32-cumsum blur vs f64 direct sums: normals agree to ~1e-3 and
        # the suppression masks (valid/depth-jump) are identical.
        np.testing.assert_array_equal(out == 0, ref == 0)
        np.testing.assert_allclose(out, ref, atol=2e-3)
        live = np.abs(ref).sum(-1) > 0
        cos = np.sum(out * ref, -1)[live]
        assert cos.min() > 0.999

    def test_no_smooth_and_scale(self):
        d = _depth_frame(2) * 1000.0
        ref = normals_from_depth_map(d, self.K, cam_scale=1000.0, smooth=0,
                                     impl="numpy")
        out = natp.normals_from_depth_map_native(d, self.K,
                                                 cam_scale=1000.0, smooth=0)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_dispatch_used_by_default(self):
        d = dc.fill_in_multiscale(_depth_frame(5))
        auto = normals_from_depth_map(d, self.K)
        native = natp.normals_from_depth_map_native(d, self.K)
        np.testing.assert_array_equal(auto, native)


class TestEdgeCases:
    def test_all_invalid_depth(self):
        d = np.zeros((60, 80), np.float32)
        ref = dc.fill_in_multiscale(d.copy())
        out = natp.fill_in_multiscale_native(d.copy())
        np.testing.assert_allclose(out, ref, atol=1e-6)
        K = np.array([[60.0, 0, 40], [0, 60, 30], [0, 0, 1]], np.float32)
        n = natp.normals_from_depth_map_native(d, K)
        assert (n == 0).all()

    def test_single_valid_pixel(self):
        d = np.zeros((60, 80), np.float32)
        d[30, 40] = 1.5
        ref = dc.fill_in_multiscale(d.copy())
        out = natp.fill_in_multiscale_native(d.copy())
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_constant_depth_plane(self):
        d = np.full((60, 80), 1.0, np.float32)
        ref = dc.fill_in_multiscale(d.copy())
        out = natp.fill_in_multiscale_native(d.copy())
        np.testing.assert_allclose(out, ref, atol=1e-4)
        K = np.array([[60.0, 0, 40], [0, 60, 30], [0, 0, 1]], np.float32)
        n_nat = natp.normals_from_depth_map_native(d, K)
        from pvn3d_tpu.data.normals import normals_from_depth_map
        n_ref = normals_from_depth_map(d, K, impl="numpy")
        np.testing.assert_allclose(n_nat, n_ref, atol=2e-3)
