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


class TestTrainBuilder:
    def _instances(self, rng, n_inst=2, n_kps=8):
        cls_ids = np.zeros(12, np.int32)
        rts = np.zeros((12, 3, 4), np.float32)
        kps = np.zeros((12, n_kps, 3), np.float32)
        ctrs = np.zeros((12, 3), np.float32)
        tuples = []
        for i in range(n_inst):
            cls_ids[i] = i + 1
            ang = rng.rand() * 2 * np.pi
            r = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0],
                          [0, 0, 1]], np.float32)
            t = rng.rand(3).astype(np.float32)
            rts[i] = np.concatenate([r, t[:, None]], 1)
            kps[i] = rng.rand(n_kps, 3).astype(np.float32) * 0.1
            ctrs[i] = rng.rand(3).astype(np.float32) * 0.1
            tuples.append((i + 1, rts[i], kps[i], ctrs[i]))
        return cls_ids, rts, kps, ctrs, tuples

    def test_targets_match_host_oracle(self):
        from pvn3d_tpu.data.device_frame import build_targets_device
        from pvn3d_tpu.data.frame import FrameSpec, build_targets
        rng = np.random.RandomState(0)
        p = 256
        cld = rng.randn(p, 3).astype(np.float32)
        labels = rng.randint(0, 4, p).astype(np.int32)   # 0..3, cls 3 absent
        cls_ids, rts, kps, ctrs, tuples = self._instances(rng)
        host = build_targets(cld, labels, tuples,
                             FrameSpec(n_keypoints=8, max_instances=12))
        dev = build_targets_device(
            jnp.asarray(cld), jnp.asarray(labels), jnp.asarray(cls_ids),
            jnp.asarray(rts), jnp.asarray(kps), jnp.asarray(ctrs),
            n_classes=22)
        for k in ("cls_ids", "rts", "kp_3ds", "ctr_3ds", "kp_targ_ofst",
                  "ctr_targ_ofst"):
            np.testing.assert_allclose(np.asarray(dev[k]), host[k],
                                       atol=1e-5, err_msg=k)

    def test_train_frame_device_runs_and_is_consistent(self):
        from pvn3d_tpu.data.device_frame import build_train_frame_device
        rng = np.random.RandomState(1)
        h, w = 48, 64
        depth = 0.8 + 0.4 * rng.rand(h, w).astype(np.float32)
        depth[rng.rand(h, w) < 0.2] = 0.0
        label_map = np.zeros((h, w), np.int32)
        label_map[10:30, 20:50] = 1
        rgb = rng.randint(0, 256, (h, w, 3)).astype(np.float32)
        k = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
        cls_ids, rts, kps, ctrs, _ = self._instances(rng, n_inst=1)
        out = build_train_frame_device(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(label_map),
            jnp.asarray(k), jnp.asarray(cls_ids), jnp.asarray(rts),
            jnp.asarray(kps), jnp.asarray(ctrs), jnp.asarray(True),
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(label_map),
            jax.random.PRNGKey(0), n_sample=512, n_classes=22,
            fill=True, dataset="ycb")
        pc = np.asarray(out["pointcloud"])
        assert pc.shape == (512, 9)
        assert np.isfinite(pc).all()
        labels_pt = np.asarray(out["labels"])
        # offsets are zero exactly off the labeled points
        kp_t = np.asarray(out["kp_targ_ofst"])
        assert (np.abs(kp_t[labels_pt == 0]) == 0).all()
        if (labels_pt == 1).any():
            assert np.abs(kp_t[labels_pt == 1]).max() > 0
        # augmented rgb stays in range
        assert np.asarray(out["rgb"]).min() >= 0
        assert np.asarray(out["rgb"]).max() <= 255

    def test_augment_off_matches_inference_features(self):
        from pvn3d_tpu.data.device_frame import (
            build_inference_frame_device, build_train_frame_device)
        rng = np.random.RandomState(2)
        h, w = 48, 64
        depth = 0.8 + 0.4 * rng.rand(h, w).astype(np.float32)
        rgb = rng.randint(0, 256, (h, w, 3)).astype(np.float32)
        label_map = np.zeros((h, w), np.int32)
        k = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
        cls_ids, rts, kps, ctrs, _ = self._instances(rng, n_inst=1)
        key = jax.random.PRNGKey(3)
        ref = build_inference_frame_device(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(k),
            jax.random.split(key, 6)[4], n_sample=256)
        out = build_train_frame_device(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(label_map),
            jnp.asarray(k), jnp.asarray(cls_ids), jnp.asarray(rts),
            jnp.asarray(kps), jnp.asarray(ctrs), jnp.asarray(False),
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(label_map),
            key, n_sample=256, n_classes=22, augment=False)
        np.testing.assert_allclose(np.asarray(out["pointcloud"]),
                                   np.asarray(ref["pointcloud"]), atol=1e-6)
