"""Host input pipeline: depth completion, normals, frame building, loader."""
import os

import numpy as np
import pytest

from pvn3d_tpu.data import augment
from pvn3d_tpu.data.depth_completion import fill_in_multiscale, fill_missing
from pvn3d_tpu.data.frame import (FrameSpec, build_frame, build_targets,
                                  collate, sample_point_budget)
from pvn3d_tpu.data.normals import knn_normals, normals_from_depth_map

K = np.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1]], np.float32)


def _plane_depth(h=240, w=320, z=1.0, holes=0.2, seed=0):
    rng = np.random.RandomState(seed)
    d = np.full((h, w), z, np.float32)
    if holes:
        d[rng.rand(h, w) < holes] = 0.0
    return d


def test_fill_multiscale_fills_holes_and_keeps_planes():
    d = _plane_depth(holes=0.3)
    out = fill_in_multiscale(d, max_depth=3.0)
    inner = out[20:-20, 20:-20]
    assert (inner > 0.01).mean() > 0.999
    np.testing.assert_allclose(inner[inner > 0.01], 1.0, atol=0.05)


def test_fill_missing_rescales():
    d = (_plane_depth(holes=0.2) * 10000).astype(np.float32)  # 0.1mm units
    out = fill_missing(d, cam_scale=10000.0, scale_to_m=1.0)
    inner = out[20:-20, 20:-20] / 10000.0
    np.testing.assert_allclose(inner[inner > 0.01], 1.0, atol=0.05)


def test_depth_map_normals_on_slanted_plane():
    # z = 1 + 0.2x -> plane normal prop to (-0.2, 0, 1), toward camera.
    h, w = 120, 160
    cols = np.arange(w, dtype=np.float32)[None, :]
    x_over_z = (cols - K[0, 2]) / K[0, 0]
    z = 1.0 / (1.0 - 0.2 * x_over_z)
    d = np.broadcast_to(z, (h, w)).astype(np.float32)
    n = normals_from_depth_map(d, K, smooth=0)
    expect = np.array([-0.2, 0.0, 1.0])
    expect = -expect / np.linalg.norm(expect)   # oriented to camera (n.p<=0)
    inner = n[10:-10, 10:-10].reshape(-1, 3)
    cos = inner @ expect
    assert np.abs(cos).min() > 0.99
    assert (cos > 0).mean() > 0.99


def test_knn_normals_on_plane():
    rng = np.random.RandomState(0)
    pts = np.stack([rng.rand(500), rng.rand(500), np.ones(500)], axis=1)
    n = knn_normals(pts, k=20)
    cos = n @ np.array([0.0, 0.0, 1.0])
    # Oriented toward viewpoint at origin -> -z.
    assert (cos < -0.99).mean() > 0.99


def test_sample_point_budget():
    rng = np.random.RandomState(0)
    over = sample_point_budget(100, 30, rng)
    assert len(over) == 30 and len(set(over.tolist())) == 30
    assert (np.diff(over) > 0).all()
    under = sample_point_budget(10, 25, rng)
    np.testing.assert_array_equal(under, np.tile(np.arange(10), 3)[:25])


def test_sample_point_budget_rejection_path_uniform():
    """The n >> k rejection path (draw + dedupe + trim) must yield a
    valid uniform k-subset: exact size, sorted unique indices, and
    per-element inclusion frequency k/n within binomial tolerance."""
    rng = np.random.RandomState(1)
    n, k, trials = 4096, 64, 3000           # n = 64*k -> rejection branch
    counts = np.zeros(n, np.int64)
    for _ in range(trials):
        sel = sample_point_budget(n, k, rng)
        assert len(sel) == k and (np.diff(sel) > 0).all()
        assert sel.min() >= 0 and sel.max() < n
        counts[sel] += 1
    p = k / n
    # Per-element count ~ Binomial(trials, p); 6-sigma band.
    sd = np.sqrt(trials * p * (1 - p))
    assert abs(counts.mean() - trials * p) < 6 * sd / np.sqrt(n)
    assert counts.max() < trials * p + 8 * sd
    assert counts.min() > trials * p - 8 * sd


def test_build_frame_targets_recover_keypoints():
    h, w = 120, 160
    depth = _plane_depth(h, w, z=1.0, holes=0.0)
    label_map = np.zeros((h, w), np.int32)
    label_map[40:80, 60:100] = 1
    rgb = np.random.RandomState(0).rand(h, w, 3).astype(np.float32) * 255
    rt = np.concatenate(
        [np.eye(3, dtype=np.float32),
         np.array([[0.05], [0.02], [1.0]], np.float32)], axis=1)
    kps = np.random.RandomState(1).uniform(-0.05, 0.05, (8, 3)).astype(
        np.float32)
    ctr = kps.mean(0)
    spec = FrameSpec(n_sample_points=1024, max_instances=3)
    s = build_frame(rgb, depth, label_map, K, 1.0, [(1, rt, kps, ctr)],
                    spec, np.random.RandomState(2))
    assert s["pointcloud"].shape == (1024, 9)
    assert s["choose"].shape == (1024,)
    assert s["kp_targ_ofst"].shape == (1024, 8, 3)
    assert s["ctr_targ_ofst"].shape == (1024, 1, 3)
    assert s["cls_ids"][0] == 1 and (s["cls_ids"][1:] == 0).all()
    # point - offset must equal the transformed keypoint, at labeled points.
    fg = s["labels"] == 1
    assert fg.sum() > 50
    cld = s["pointcloud"][:, :3]
    kp_cam = kps @ rt[:, :3].T + rt[:, 3]
    rec = cld[fg][:, None, :] - s["kp_targ_ofst"][fg]
    np.testing.assert_allclose(rec, np.broadcast_to(kp_cam, rec.shape),
                               atol=1e-5)
    # choose indices must unproject to the same points.
    np.testing.assert_allclose(
        cld[:, 2], depth.reshape(-1)[s["choose"]], atol=1e-6)
    # Background points carry zero offsets.
    assert np.abs(s["kp_targ_ofst"][~fg]).max() == 0.0


def test_build_frame_too_few_points_returns_none():
    depth = np.zeros((60, 80), np.float32)
    depth[0, :10] = 1.0
    s = build_frame(np.zeros((60, 80, 3), np.float32), depth,
                    np.zeros((60, 80), np.int32), K, 1.0, [],
                    FrameSpec(n_sample_points=512), np.random.RandomState(0))
    assert s is None


def test_augment_shapes_and_ranges():
    rng = np.random.RandomState(0)
    img = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
    for fn in (augment.color_jitter, augment.rgb_add_noise_ycb,
               augment.rgb_add_noise_lm):
        out = fn(np.random.RandomState(1), img)
        assert out.shape == img.shape and out.dtype == np.uint8


def test_add_real_back_composites_background():
    rgb = np.full((20, 20, 3), 200.0, np.float32)
    labels = np.zeros((20, 20), np.int32)
    labels[5:10, 5:10] = 1
    depth = np.zeros((20, 20), np.float32)
    depth[5:10, 5:10] = 2.0
    back_rgb = np.full((20, 20, 3), 50.0, np.float32)
    back_depth = np.full((20, 20), 1.5, np.float32)
    back_label = np.zeros((20, 20), np.int32)
    out_rgb, out_d = augment.add_real_back(
        rgb, labels, depth, depth > 1e-6, back_rgb, back_depth, back_label)
    assert out_rgb[0, 0, 0] == 50.0 and out_rgb[6, 6, 0] == 200.0
    assert out_d[0, 0] == 1.5 and out_d[6, 6] == 2.0


class _ToyDS:
    def __init__(self):
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return 10

    def __getitem__(self, i):
        if i == 3:          # simulate a bad frame
            return None
        return {"x": np.full((4,), float(i), np.float32)}


def test_loader_inline_skips_none_and_collates():
    from pvn3d_tpu.data.loader import DataLoader
    dl = DataLoader(_ToyDS, batch_size=3, num_workers=0)
    batches = list(dl)
    assert len(batches) == 3            # 9 good samples -> 3 full batches
    assert batches[0]["x"].shape == (3, 4)
    seen = np.concatenate([b["x"][:, 0] for b in batches])
    assert 3.0 not in seen.tolist()


def test_loader_pads_final_partial_batch():
    # Epoch mode must not drop the trailing n % batch_size samples:
    # the final batch is padded (repeat-last) and tagged with the real
    # count so eval scores every frame at one jitted batch shape.
    from pvn3d_tpu.data.loader import DataLoader
    dl = DataLoader(_ToyDS, batch_size=4, num_workers=0)
    batches = list(dl)
    assert [b["x"].shape[0] for b in batches] == [4, 4, 4]
    assert batches[-1]["_n_valid"] == 1   # 9 good samples = 2*4 + 1
    assert all("_n_valid" not in b for b in batches[:-1])
    real = np.concatenate(
        [b["x"][:b.get("_n_valid", len(b["x"])), 0] for b in batches])
    assert sorted(real.tolist()) == [0., 1., 2., 4., 5., 6., 7., 8., 9.]
    # pad rows repeat the last real sample
    assert batches[-1]["x"][1:, 0].tolist() == [9.0, 9.0, 9.0]

    dropped = list(DataLoader(_ToyDS, batch_size=4, num_workers=0,
                              pad_last=False))
    assert [b["x"].shape[0] for b in dropped] == [4, 4]
import numpy as np
from pvn3d_tpu.data.depth_completion import fill_in_fast, fill_missing

def test_fast_fill():
    rng = np.random.RandomState(0)
    d = np.full((120, 160), 1.0, np.float32)
    d[rng.rand(120, 160) < 0.3] = 0.0
    out = fill_in_fast(d, max_depth=3.0)
    inner = out[15:-15, 15:-15]
    assert (inner > 0.01).mean() > 0.99
    np.testing.assert_allclose(inner[inner > 0.01], 1.0, atol=0.1)
    out2 = fill_missing(d * 1000, cam_scale=1000.0, fill_type="fast")
    assert np.isfinite(out2).all()


def test_loader_multiprocess_workers():
    from pvn3d_tpu.data.loader import DataLoader
    dl = DataLoader(_ToyDS, batch_size=3, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    seen = sorted(np.concatenate([b["x"][:, 0] for b in batches]).tolist())
    assert seen == [0.0, 1.0, 2.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
