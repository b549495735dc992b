"""Device frame build vs the host build_frame on the same raw frame."""
import numpy as np
import jax
import jax.numpy as jnp

from pvn3d_tpu.data.device_frame import (build_inference_batch_device,
                                         build_inference_frame_device)

K = np.array([[572.4, 0, 160.0], [0, 573.5, 120.0], [0, 0, 1]], np.float32)


def _raw_frame(seed=0, h=120, w=160):
    rng = np.random.RandomState(seed)
    d = np.full((h, w), 1.1, np.float32)
    d[40:80, 50:110] = 0.8
    for _ in range(15):
        r0, c0 = rng.randint(0, h - 6), rng.randint(0, w - 6)
        d[r0:r0 + 4, c0:c0 + 4] = 0.0
    rgb = (rng.rand(h, w, 3) * 255).astype(np.float32)
    return rgb, d


def test_features_match_host_at_chosen_pixels():
    rgb, d = _raw_frame()
    out = build_inference_frame_device(
        jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
        jax.random.PRNGKey(0), n_sample=2048, fill=True)
    choose = np.asarray(out["choose"])
    pc = np.asarray(out["pointcloud"])
    assert pc.shape == (2048, 9)
    assert (np.diff(choose) >= 0).all()              # ascending like host

    # xyz must equal the host unprojection of the device-filled depth.
    depth_m = np.asarray(out["depth_m"])
    h, w = d.shape
    rr, cc = choose // w, choose % w
    z = depth_m[rr, cc]
    x = (cc - K[0, 2]) * z / K[0, 0]
    y = (rr - K[1, 2]) * z / K[1, 1]
    np.testing.assert_allclose(pc[:, 0], x, atol=1e-5)
    np.testing.assert_allclose(pc[:, 1], y, atol=1e-5)
    np.testing.assert_allclose(pc[:, 2], z, atol=1e-6)
    # rgb features are the raw pixel values at choose
    np.testing.assert_array_equal(pc[:, 3:6], rgb[rr, cc])
    # normals are unit or zero
    nn = np.linalg.norm(pc[:, 6:9], axis=1)
    assert set(np.round(np.unique(nn), 3)).issubset({0.0, 1.0})
    # filled depth: every chosen pixel is valid
    assert (z > 1e-6).all()


def test_no_fill_keeps_holes_out():
    rgb, d = _raw_frame(1)
    out = build_inference_frame_device(
        jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
        jax.random.PRNGKey(0), n_sample=1024, fill=False)
    z = np.asarray(out["pointcloud"][:, 2])
    assert (z > 1e-6).all()                          # holes never sampled
    np.testing.assert_allclose(np.asarray(out["depth_m"]), d, atol=0)


def test_under_budget_pads():
    rgb, d = _raw_frame(2)
    mask = np.zeros_like(d)
    mask[60:62, 60:70] = d[60:62, 60:70]             # 20 valid pixels
    out = build_inference_frame_device(
        jnp.asarray(rgb), jnp.asarray(mask), jnp.asarray(K),
        jax.random.PRNGKey(0), n_sample=256, fill=False)
    choose = np.asarray(out["choose"])
    w = d.shape[1]
    rr = choose // w
    assert ((rr >= 60) & (rr < 62)).all()            # only valid pixels


def test_batched_matches_single():
    rgb, d = _raw_frame(3)
    key = jax.random.PRNGKey(7)
    batch = build_inference_batch_device(
        jnp.asarray(rgb)[None], jnp.asarray(d)[None],
        jnp.asarray(K)[None], key, n_sample=512)
    single = build_inference_frame_device(
        jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
        jax.random.split(key, 1)[0], n_sample=512)
    np.testing.assert_allclose(np.asarray(batch["pointcloud"][0]),
                               np.asarray(single["pointcloud"]), atol=0)
