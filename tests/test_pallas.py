"""Pallas kernels vs their XLA reference implementations (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvn3d_tpu.ops.pallas.fps import fps_pallas
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
