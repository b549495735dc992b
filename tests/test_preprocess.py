"""On-device preprocessing twins vs the host (numpy/cv2) originals."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from pvn3d_tpu.data.depth_completion import fill_in_multiscale, fill_missing
from pvn3d_tpu.data.normals import normals_from_depth_map
from pvn3d_tpu.ops.preprocess import (fill_in_multiscale_jnp,
                                      fill_missing_jnp,
                                      normals_from_depth_map_jnp)

K = np.array([[572.4, 0, 160.0], [0, 573.5, 120.0], [0, 0, 1]], np.float32)


def _scene_depth(seed=0, h=120, w=160):
    """Plane + box + sensor-dropout holes, meters."""
    rng = np.random.RandomState(seed)
    d = np.full((h, w), 1.2, np.float32)
    d += np.linspace(0, 0.3, w)[None, :]                  # slanted table
    d[40:80, 50:110] = 0.8                                # object
    d[44:76, 54:106] += 0.02 * rng.randn(32, 52)          # surface noise
    for _ in range(25):                                   # holes
        r0, c0 = rng.randint(0, h - 8), rng.randint(0, w - 8)
        d[r0:r0 + rng.randint(2, 8), c0:c0 + rng.randint(2, 8)] = 0.0
    d[:6] = 0.0                                           # empty sky rows
    # Edge-of-range depths: near max_depth (inverted value < 0.1) and
    # shallow-but-valid (0.01, 0.1] — both corrupted if the device twin's
    # validity eps disagrees with the host's 0.01.
    d[90:100, 10:20] = 2.96
    d[100:110, 10:20] = 0.05
    return d


@pytest.mark.parametrize("seed", [0, 3])
def test_fill_multiscale_matches_host(seed):
    d = _scene_depth(seed)
    host = fill_in_multiscale(d.copy())
    dev = np.asarray(fill_in_multiscale_jnp(jnp.asarray(d)))
    np.testing.assert_allclose(dev, host, atol=2e-3, rtol=1e-4)
    # strict agreement on the overwhelming majority of pixels
    assert np.mean(np.abs(dev - host) < 1e-4) > 0.99


@pytest.mark.parametrize("seed", [0, 1])
def test_median5_network_is_exact_median(seed):
    # The pruned min/max selection network must equal the true order
    # statistic bit-for-bit (BORDER_REPLICATE, ties included).
    from pvn3d_tpu.ops.preprocess import _median5
    rng = np.random.RandomState(seed)
    x = (rng.rand(23, 31) * (rng.rand(23, 31) > 0.3)).astype(np.float32)
    got = np.asarray(_median5(jnp.asarray(x)))
    xp = np.pad(x, 2, mode="edge")
    want = np.empty_like(x)
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            want[i, j] = np.median(xp[i:i + 5, j:j + 5])
    np.testing.assert_array_equal(got, want)


def test_fill_missing_matches_host():
    d = _scene_depth(1) * 10000.0                         # 0.1mm units
    host = fill_missing(d, 10000.0, 1.0)
    dev = np.asarray(fill_missing_jnp(jnp.asarray(d), 10000.0, 1.0))
    np.testing.assert_allclose(dev, host, atol=25.0, rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 2])
def test_normals_match_host(seed):
    d = _scene_depth(seed)
    host = normals_from_depth_map(d, K, 1.0)
    dev = np.asarray(normals_from_depth_map_jnp(jnp.asarray(d),
                                                jnp.asarray(K), 1.0))
    # The host box blur accumulates with a full-image f32 cumsum; the
    # device twin uses windowed sums, which are *more* accurate (flat
    # regions give exact zeros).  Max observed deviation ~2.5e-3.
    np.testing.assert_allclose(dev, host, atol=5e-3)


def test_normals_unit_and_camera_facing():
    d = _scene_depth(0)
    n = np.asarray(normals_from_depth_map_jnp(jnp.asarray(d),
                                              jnp.asarray(K), 1.0))
    norms = np.linalg.norm(n, axis=-1)
    assert set(np.round(np.unique(norms), 3)).issubset({0.0, 1.0})
    # flipped toward the camera at the origin: n . p <= 0
    h, w = d.shape
    cols = (np.arange(w, dtype=np.float32)[None, :] - K[0, 2]) / K[0, 0]
    rows = (np.arange(h, dtype=np.float32)[:, None] - K[1, 2]) / K[1, 1]
    p = np.stack([cols * d, rows * d, d], axis=-1)
    dot = np.sum(n * p, axis=-1)[norms > 0.5]
    assert (dot <= 1e-5).all()
