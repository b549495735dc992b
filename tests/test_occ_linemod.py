"""Occlusion-LineMOD loader: Brachmann-layout checkout in a tmpdir.

The reference's -test_occ path is broken upstream (OCC_LM_Dataset is
undefined, train_linemod_pvn3d.py:441-443); these tests pin the behavior
of this framework's working implementation against a generated checkout
(tools/fake_data.py::make_fake_occlusion_linemod).
"""
import numpy as np
import pytest

from pvn3d_tpu.data.frame import FrameSpec
from pvn3d_tpu.data.occlusion_linemod import (OcclusionLineMODDataset,
                                              parse_occ_info)
from pvn3d_tpu.tools.fake_data import make_fake_occlusion_linemod


@pytest.fixture(scope="module")
def occ_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("occ")
    return make_fake_occlusion_linemod(str(root), n_frames=4,
                                       cls_type="ape", with_masks=False)


def test_parse_occ_info(tmp_path):
    p = tmp_path / "info_00000.txt"
    p.write_text("image size\n640 480\nape\nrotation:\n"
                 "0.1 0.2 0.3\n0.4 0.5 0.6\n0.7 0.8 0.9\n"
                 "center:\n-0.1 0.02 1.5\nextent:\n0.06 0.08 0.07\n")
    rt = parse_occ_info(str(p))
    np.testing.assert_allclose(rt[:, :3].ravel(),
                               np.arange(1, 10, dtype=np.float32) / 10)
    np.testing.assert_allclose(rt[:, 3], [-0.1, 0.02, 1.5])


def test_parse_occ_info_unannotated(tmp_path):
    assert parse_occ_info(str(tmp_path / "missing.txt")) is None
    p = tmp_path / "info_00001.txt"
    p.write_text("image size\n640 480\nape\nrotation:\n0.1 0.2\n")
    assert parse_occ_info(str(p)) is None


def test_occ_dataset_reads_frames(occ_root):
    spec = FrameSpec(n_sample_points=2048)
    ds = OcclusionLineMODDataset(occ_root, cls_type="ape", spec=spec)
    assert len(ds) == 4
    s = ds[0]
    assert s is not None
    assert s["pointcloud"].shape == (2048, 9)
    assert s["rts"].shape[0] >= 1
    # GT translation round-trips through the info file (±1 mm).
    rt = s["rts"][0]
    assert abs(rt[2, 3] - 0.8) < 1e-3
    # Synthesized label marks visible object points only: the 0.6 m
    # occluder strip must be excluded.
    assert s["labels"].max() == 1


def test_occ_dataset_skips_unannotated(occ_root):
    ds = OcclusionLineMODDataset(occ_root, cls_type="ape",
                                 spec=FrameSpec(n_sample_points=2048))
    assert ds[len(ds) - 1] is None          # last frame has no info file


def test_occ_dataset_masks_dir(tmp_path):
    root = make_fake_occlusion_linemod(str(tmp_path), n_frames=2,
                                       cls_type="ape", with_masks=True)
    ds = OcclusionLineMODDataset(root, cls_type="ape",
                                 spec=FrameSpec(n_sample_points=2048))
    s = ds[0]
    assert s is not None and s["labels"].max() == 1


def test_occ_rejects_train_split(occ_root):
    with pytest.raises(ValueError):
        OcclusionLineMODDataset(occ_root, cls_type="ape", split="train")
    with pytest.raises(ValueError):
        OcclusionLineMODDataset(occ_root, cls_type="benchvise")
