"""Native CPU FPS extension + mesh-info tooling."""
import os
import struct

import numpy as np
import pytest

from pvn3d_tpu.native import (_fps_center_numpy, _fps_numpy,
                              farthest_point_sampling, load_library)
from pvn3d_tpu.tools.gen_obj_info import (bbox_center, bbox_radius,
                                          corners_3d, gen_one_mesh_info)


def test_native_library_builds():
    assert load_library() is not None, "g++ build of fps.cpp failed"


def test_native_matches_numpy_reference():
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3).astype(np.float32)
    lib = load_library()
    assert lib is not None
    idxs = np.zeros(32, np.int32)
    lib.pvn3d_fps(np.ascontiguousarray(pts), 500, 32, 7, idxs)
    np.testing.assert_array_equal(idxs, _fps_numpy(pts, 32, 7))
    idxs_c = np.zeros(32, np.int32)
    lib.pvn3d_fps_center(np.ascontiguousarray(pts), 500, 32, idxs_c)
    np.testing.assert_array_equal(idxs_c, _fps_center_numpy(pts, 32))


def test_fps_separation_property():
    # FPS keypoints must be more spread than random ones.
    rng = np.random.RandomState(1)
    pts = rng.rand(2000, 3).astype(np.float32)
    kps = farthest_point_sampling(pts, 8, seed=0)
    assert kps.shape == (8, 3)
    d = np.linalg.norm(kps[:, None] - kps[None, :], axis=-1)
    min_sep = d[~np.eye(8, dtype=bool)].min()
    rnd = pts[rng.choice(2000, 8, replace=False)]
    dr = np.linalg.norm(rnd[:, None] - rnd[None, :], axis=-1)
    assert min_sep > dr[~np.eye(8, dtype=bool)].min()


def _write_ascii_ply(path, pts):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(pts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def test_gen_obj_info_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    pts = rng.uniform(-30.0, 30.0, (400, 3)).astype(np.float32)  # mm scale
    ply = str(tmp_path / "obj.ply")
    _write_ascii_ply(ply, pts)
    out = str(tmp_path / "info")
    info = gen_one_mesh_info(ply, out, scale=1000.0, kp_counts=(8, 4))
    assert info["n_points"] == 400
    corners = np.loadtxt(os.path.join(out, "corners.txt"))
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.max(0), pts.max(0) / 1000.0,
                               atol=1e-6)
    radius = float(open(os.path.join(out, "radius.txt")).read())
    assert radius == pytest.approx(
        np.linalg.norm(pts.max(0) - pts.min(0)) / 2000.0, rel=1e-5)
    kps = np.loadtxt(os.path.join(out, "farthest.txt"))
    assert kps.shape == (8, 3)
    kps4 = np.loadtxt(os.path.join(out, "farthest4.txt"))
    assert kps4.shape == (4, 3)
    # Keypoints lie on the (scaled) mesh.
    d = np.linalg.norm(kps[:, None] - pts[None] / 1000.0, axis=-1).min(1)
    assert d.max() < 1e-6
