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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--n_frames", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    print(make_fake_linemod(args.root, args.n_frames, seed=args.seed))


if __name__ == "__main__":
    main()
