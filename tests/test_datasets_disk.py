"""Disk-level dataset integration: fake YCB / LineMOD checkouts in tmpdirs."""
import os
import pickle

import numpy as np
import pytest

from pvn3d_tpu.data.frame import FrameSpec
from pvn3d_tpu.data.linemod import LineMODDataset
from pvn3d_tpu.data.ycb import YCBDataset

K1 = np.array([[1066.778, 0, 312.9869],
               [0, 1067.487, 241.3109], [0, 0, 1]], np.float32)


def _save_png(path, arr, mode=None):
    from PIL import Image
    Image.fromarray(arr, mode=mode).save(path)


def _fake_scene(rng, h=480, w=640, cls_id=1):
    depth = np.full((h, w), 10000, np.uint16)          # 1.0 m at scale 1e4
    label = np.zeros((h, w), np.uint8)
    label[200:280, 260:380] = cls_id
    depth[200:280, 260:380] = 8000                     # object at 0.8 m
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    rt = np.concatenate([np.eye(3, dtype=np.float32),
                         np.array([[0.0], [0.0], [0.8]], np.float32)], axis=1)
    return rgb, depth, label, rt


@pytest.fixture
def fake_ycb_root(tmp_path):
    import scipy.io as scio
    rng = np.random.RandomState(0)
    root = tmp_path / "ycb"
    (root / "data" / "0001").mkdir(parents=True)
    item = "data/0001/000001"
    rgb, depth, label, rt = _fake_scene(rng)
    _save_png(str(root / f"{item}-color.png"), rgb)
    _save_png(str(root / f"{item}-depth.png"), depth)
    _save_png(str(root / f"{item}-label.png"), label)
    scio.savemat(str(root / f"{item}-meta.mat"), {
        "factor_depth": np.array([[10000.0]]),
        "cls_indexes": np.array([[1]], np.uint32),
        "poses": rt[:, :, None],
    })
    return str(root), item


def test_ycb_dataset_reads_fake_frame(fake_ycb_root, monkeypatch):
    root, item = fake_ycb_root
    spec = FrameSpec(n_sample_points=2048)
    ds = YCBDataset(root, split="test", spec=spec, fill_depth=False)
    s = ds.get_item(item)
    assert s is not None
    assert s["pointcloud"].shape == (2048, 9)
    assert s["rgb"].shape == (480, 640, 3)
    assert s["cls_ids"][0] == 1
    # Object points sit at ~0.8 m, background at ~1.0 m.
    fg = s["labels"] == 1
    assert fg.sum() > 10
    np.testing.assert_allclose(s["pointcloud"][fg, 2], 0.8, atol=0.01)
    # Center offset points from each object point to the object center
    # (the class-1 asset center transformed by the GT pose).
    from pvn3d_tpu.utils.assets import get_ctr
    ctr_cam = get_ctr(1, ds_type="ycb") + np.array([0.0, 0.0, 0.8])
    rec = s["pointcloud"][fg, :3] - s["ctr_targ_ofst"][fg, 0]
    np.testing.assert_allclose(rec, np.broadcast_to(ctr_cam, rec.shape),
                               atol=1e-4)


def test_ycb_dataset_device_preprocess_mode(fake_ycb_root):
    """Raw eval mode: host ships decoded arrays + GT only; no fill /
    normals / sampling on the host (data/frame.py::FrameSpec
    .device_preprocess)."""
    root, item = fake_ycb_root
    spec = FrameSpec(device_preprocess=True)
    ds = YCBDataset(root, split="test", spec=spec, fill_depth=True)
    s = ds.get_item(item)
    assert s is not None
    assert set(s) == {"rgb", "depth", "cam_k", "label_map", "cls_ids",
                      "rts", "kp_3ds", "ctr_3ds"}
    assert s["depth"].shape == (480, 640)
    # depth is metric and UNFILLED (host fill skipped): the fake scene's
    # background is ~1.0 m.
    assert 0.5 < np.median(s["depth"][s["depth"] > 0]) < 1.5
    assert s["cls_ids"][0] == 1 and s["rts"].shape == (12, 3, 4)


@pytest.fixture
def fake_lm_root(tmp_path):
    import yaml
    rng = np.random.RandomState(1)
    root = tmp_path / "Linemod_preprocessed"
    cls_root = root / "data" / "01"
    for sub in ("rgb", "depth", "mask"):
        (cls_root / sub).mkdir(parents=True)
    rgb, depth, label, rt = _fake_scene(rng)
    depth_mm = (depth.astype(np.float32) / 10.0).astype(np.uint16)  # mm
    _save_png(str(cls_root / "rgb" / "0000.png"), rgb)
    _save_png(str(cls_root / "depth" / "0000.png"), depth_mm)
    _save_png(str(cls_root / "mask" / "0000.png"), label * 255)
    meta = {0: [{"obj_id": 1,
                 "cam_R_m2c": rt[:, :3].ravel().tolist(),
                 "cam_t_m2c": (rt[:, 3] * 1000).tolist()}]}
    with open(cls_root / "gt.yml", "w") as f:
        yaml.safe_dump(meta, f)
    with open(cls_root / "test.txt", "w") as f:
        f.write("0000\n")
    with open(cls_root / "train.txt", "w") as f:
        f.write("0000\n")
    return str(root)


def test_linemod_dataset_reads_fake_frame(fake_lm_root):
    spec = FrameSpec(n_sample_points=2048)
    ds = LineMODDataset(fake_lm_root, cls_type="ape", split="test", spec=spec)
    s = ds[0]
    assert s is not None
    assert s["pointcloud"].shape == (2048, 9)
    fg = s["labels"] == 1
    assert fg.sum() > 10
    np.testing.assert_allclose(s["pointcloud"][fg, 2], 0.8, atol=0.01)
    assert np.allclose(s["rts"][0][:, 3], [0, 0, 0.8], atol=1e-6)


def test_linemod_render_pkl_item(fake_lm_root, tmp_path):
    rng = np.random.RandomState(2)
    rgb, depth, label, rt = _fake_scene(rng)
    pkl_path = str(tmp_path / "render0.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump({"depth": depth.astype(np.float32) / 10000.0,
                     "rgb": rgb, "mask": label, "K": K1, "RT": rt,
                     "rnd_typ": "render"}, f)
    ds = LineMODDataset(fake_lm_root, cls_type="ape", split="test",
                        spec=FrameSpec(n_sample_points=1024))
    s = ds.get_item(pkl_path)
    assert s is not None and s["pointcloud"].shape == (1024, 9)


def test_read_ply_vertices_both_endiannesses(tmp_path):
    # Binary PLYs declare their byte order in the header; both must
    # decode to the same coordinates (big-endian was silently read as
    # little-endian before).
    from pvn3d_tpu.utils.assets import read_ply_vertices
    verts = np.array([[1.5, -2.25, 3.0], [0.125, 4.5, -6.0]], np.float32)
    for tag, end in [("binary_little_endian", "<"),
                     ("binary_big_endian", ">")]:
        hdr = (f"ply\nformat {tag} 1.0\nelement vertex 2\n"
               "property float x\nproperty float y\nproperty float z\n"
               "end_header\n").encode()
        p = tmp_path / f"{tag}.ply"
        p.write_bytes(hdr + verts.astype(end + "f4").tobytes())
        np.testing.assert_array_equal(read_ply_vertices(str(p)), verts)
