"""Generate a synthetic LineMOD-format checkout for smoke/integration runs.

Produces data/01/{rgb,depth,mask}/NNNN.png, gt.yml, train.txt/test.txt and
models/obj_01.ply under the given root — enough to drive the full
train/evaluate/demo CLIs without real data (used by the e2e smoke runs;
a fake YCB variant lives in tests/test_datasets_disk.py fixtures).

  python -m pvn3d_tpu.tools.fake_data --root /tmp/fakelm --n_frames 6
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import yaml


def make_fake_linemod(root: str, n_frames: int = 6, cls_id: int = 1,
                      seed: int = 0, h: int = 480, w: int = 640) -> str:
    from PIL import Image
    lm_root = os.path.join(root, "Linemod_preprocessed")
    cls_root = os.path.join(lm_root, "data", "%02d" % cls_id)
    for sub in ("rgb", "depth", "mask"):
        os.makedirs(os.path.join(cls_root, sub), exist_ok=True)
    rng = np.random.RandomState(seed)
    meta = {}
    names = []
    for i in range(n_frames):
        name = f"{i:04d}"
        names.append(name)
        depth = np.full((h, w), 1000, np.uint16)          # 1.0 m in mm
        label = np.zeros((h, w), np.uint8)
        r0 = 160 + (11 * i) % 120
        c0 = 220 + (13 * i) % 160
        label[r0:r0 + 90, c0:c0 + 120] = 255
        depth[r0:r0 + 90, c0:c0 + 120] = 800              # 0.8 m object
        rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(f"{cls_root}/rgb/{name}.png")
        Image.fromarray(depth).save(f"{cls_root}/depth/{name}.png")
        Image.fromarray(label).save(f"{cls_root}/mask/{name}.png")
        meta[i] = [{"obj_id": cls_id,
                    "cam_R_m2c": np.eye(3).ravel().tolist(),
                    "cam_t_m2c": [20.0 * i, 10.0, 800.0]}]
    with open(os.path.join(cls_root, "gt.yml"), "w") as f:
        yaml.safe_dump(meta, f)
    for split in ("train.txt", "test.txt"):
        with open(os.path.join(cls_root, split), "w") as f:
            f.write("\n".join(names) + "\n")

    os.makedirs(os.path.join(lm_root, "models"), exist_ok=True)
    pts = rng.uniform(-30, 30, (500, 3))                  # mm
    with open(os.path.join(lm_root, "models",
                           "obj_%02d.ply" % cls_id), "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 500\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    return lm_root


def make_fake_occlusion_linemod(root: str, n_frames: int = 6,
                                cls_type: str = "ape", seed: int = 0,
                                h: int = 480, w: int = 640,
                                with_masks: bool = False) -> str:
    """OCCLUSION_LINEMOD-layout checkout (Brachmann): RGB-D/{rgb,depth}_noseg,
    poses/<ObjName>/info_*.txt, models/obj_XX.ply; frame n_frames-1 is left
    unannotated (missing info file) to exercise the absent-object skip."""
    from PIL import Image

    from pvn3d_tpu import config as C
    from pvn3d_tpu.data.occlusion_linemod import OCC_POSE_DIRS
    occ_root = os.path.join(root, "OCCLUSION_LINEMOD")
    cls_id = C.LM_OBJ_DICT[cls_type]
    rgb_dir = os.path.join(occ_root, "RGB-D", "rgb_noseg")
    dep_dir = os.path.join(occ_root, "RGB-D", "depth_noseg")
    pose_dir = os.path.join(occ_root, "poses", OCC_POSE_DIRS[cls_type])
    for d in (rgb_dir, dep_dir, pose_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n_frames):
        name = f"{i:05d}"
        depth = np.full((h, w), 1000, np.uint16)
        r0 = 160 + (11 * i) % 120
        c0 = 220 + (13 * i) % 160
        depth[r0:r0 + 90, c0:c0 + 120] = 800
        # occluder strip in front of part of the object
        depth[r0:r0 + 90, c0:c0 + 20] = 600
        rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(f"{rgb_dir}/color_{name}.png")
        Image.fromarray(depth).save(f"{dep_dir}/depth_{name}.png")
        if i == n_frames - 1:
            continue                        # unannotated frame
        k = C.INTRINSICS["linemod"]
        # center projecting into the object box at depth 0.8 m
        cx = (c0 + 60 - k[0, 2]) * 0.8 / k[0, 0]
        cy = (r0 + 45 - k[1, 2]) * 0.8 / k[1, 1]
        with open(f"{pose_dir}/info_{name}.txt", "w") as f:
            f.write(f"image size\n{w} {h}\n{cls_type}\nrotation:\n"
                    "1 0 0\n0 1 0\n0 0 1\ncenter:\n"
                    f"{cx:.6f} {cy:.6f} 0.8\nextent:\n0.06 0.08 0.07\n")
        if with_masks:
            mdir = os.path.join(occ_root, "masks", cls_type)
            os.makedirs(mdir, exist_ok=True)
            label = np.zeros((h, w), np.uint8)
            label[r0:r0 + 90, c0 + 20:c0 + 120] = 255
            Image.fromarray(label).save(f"{mdir}/{i}.png")

    os.makedirs(os.path.join(occ_root, "models"), exist_ok=True)
    pts = rng.uniform(-30, 30, (500, 3))                  # mm
    with open(os.path.join(occ_root, "models",
                           "obj_%02d.ply" % cls_id), "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 500\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    return occ_root


def make_fake_ycb(root: str, n_frames: int = 4, seed: int = 0,
                  h: int = 480, w: int = 640,
                  cls_ids=(1, 5, 9, 14, 21)) -> str:
    """YCB-Video-layout checkout: data/0001 (real) + data_syn frames with
    realistic depth holes (exercises ip_basic fill), multi-object labels,
    meta.mat poses, models/<cls>/points.xyz.  Writes ``image_list.txt``
    for the YCBDataset ``file_list`` override.  Returns the root."""
    import scipy.io as scio
    from PIL import Image

    from pvn3d_tpu.utils.assets import ycb_class_list
    ycb_root = os.path.join(root, "ycb")
    os.makedirs(os.path.join(ycb_root, "data", "0001"), exist_ok=True)
    os.makedirs(os.path.join(ycb_root, "data_syn"), exist_ok=True)
    rng = np.random.RandomState(seed)
    items = []
    for i in range(n_frames):
        real = i % 2 == 0
        item = (f"data/0001/{i + 1:06d}" if real
                else f"data_syn/{i + 1:06d}")
        items.append(item)
        depth = np.full((h, w), 10000, np.uint16)      # 1.0 m @ 1e4
        label = np.zeros((h, w), np.uint8)
        poses = np.zeros((3, 4, len(cls_ids)), np.float32)
        for j, cid in enumerate(cls_ids):
            r0 = 80 + 70 * j + (7 * i) % 30
            c0 = 60 + 100 * j + (11 * i) % 40
            label[r0:r0 + 60, c0:c0 + 80] = cid
            depth[r0:r0 + 60, c0:c0 + 80] = 8000
            poses[:, :, j] = np.concatenate(
                [np.eye(3, dtype=np.float32),
                 [[0.1 * j], [0.05 * j], [0.8]]], axis=1)
        # depth holes: the sensor-dropout pattern ip_basic fills
        for _ in range(40):
            hr = rng.randint(0, h - 12)
            hc = rng.randint(0, w - 12)
            depth[hr:hr + rng.randint(2, 12),
                  hc:hc + rng.randint(2, 12)] = 0
        rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(f"{ycb_root}/{item}-color.png")
        Image.fromarray(depth).save(f"{ycb_root}/{item}-depth.png")
        Image.fromarray(label).save(f"{ycb_root}/{item}-label.png")
        scio.savemat(f"{ycb_root}/{item}-meta.mat", {
            "factor_depth": np.array([[10000.0]]),
            "cls_indexes": np.array([cls_ids], np.uint32).T,
            "poses": poses,
        })
    classes = ycb_class_list()
    for cid in cls_ids:
        mdir = os.path.join(ycb_root, "models", classes[cid - 1])
        os.makedirs(mdir, exist_ok=True)
        pts = rng.uniform(-0.04, 0.04, (500, 3))
        np.savetxt(os.path.join(mdir, "points.xyz"), pts, fmt="%.6f")
    with open(os.path.join(ycb_root, "image_list.txt"), "w") as f:
        f.write("\n".join(items) + "\n")
    return ycb_root


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--n_frames", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--occ", action="store_true",
                   help="also write an OCCLUSION_LINEMOD-layout checkout")
    p.add_argument("--ycb", action="store_true",
                   help="also write a YCB-Video-layout checkout")
    args = p.parse_args(argv)
    print(make_fake_linemod(args.root, args.n_frames, seed=args.seed))
    if args.occ:
        print(make_fake_occlusion_linemod(args.root, args.n_frames,
                                          seed=args.seed))
    if args.ycb:
        print(make_fake_ycb(args.root, args.n_frames, seed=args.seed))


if __name__ == "__main__":
    main()
