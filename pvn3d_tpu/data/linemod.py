"""LineMOD dataset (host-side input pipeline).

Capability match for the reference LM_Dataset (pvn3d/datasets/linemod/
linemod_dataset.py): per-object single-class frames, real/render/fuse
training mix (real_ratio 0.3, fuse 0.4 of the remainder, :79-93), BGR
channel order (:235 flips), mm->m poses from gt.yml, no depth completion
(cf. :243), binary labels.  Benchvise (cls_id 2) selects its own meta entry
from multi-object gt lists (:216-220).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np
import yaml

from pvn3d_tpu import config as C
from pvn3d_tpu.data import augment
from pvn3d_tpu.data.frame import FrameSpec, build_frame
from pvn3d_tpu.utils.assets import get_ctr, get_kps


def _read_lines(path):
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def _load_image(path):
    from PIL import Image
    with Image.open(path) as im:
        return np.array(im)


class LineMODDataset:
    """Frames from a Linemod_preprocessed checkout."""

    def __init__(self, root: str, cls_type: str = "ape",
                 split: str = "train", spec: Optional[FrameSpec] = None,
                 seed: int = 0):
        self.root = root                       # .../Linemod_preprocessed
        self.cls_type = cls_type
        self.cls_id = C.LM_OBJ_DICT[cls_type]
        self.cls_root = os.path.join(root, "data", "%02d" % self.cls_id)
        self.split = split
        self.spec = spec or FrameSpec()
        self.rng = np.random.RandomState(seed)
        self.add_noise = split == "train"
        with open(os.path.join(self.cls_root, "gt.yml")) as f:
            self.meta_lst = yaml.safe_load(f)
        if split == "train":
            self.real_lst = _read_lines(
                os.path.join(self.cls_root, "train.txt"))
            rnd_list = os.path.join(root, "renders", cls_type,
                                    "file_list.txt")
            self.rnd_lst = (_read_lines(rnd_list)
                            if os.path.exists(rnd_list) else [])
            fuse_list = os.path.join(root, "fuse", cls_type, "file_list.txt")
            self.fuse_lst = (_read_lines(fuse_list)
                             if os.path.exists(fuse_list) else self.rnd_lst)
            self.all_lst = self.real_lst + self.rnd_lst + self.fuse_lst
        else:
            self.all_lst = _read_lines(
                os.path.join(self.cls_root, "test.txt"))

    def __len__(self):
        return len(self.all_lst)

    def _pick_train_item(self, real_ratio: float = 0.3) -> str:
        # reference: real_syn_gen (linemod_dataset.py:79-93).
        if self.rng.rand() < real_ratio or not self.rnd_lst:
            return self.real_lst[self.rng.randint(len(self.real_lst))]
        if self.rng.rand() < 0.4 and self.fuse_lst:
            return self.fuse_lst[self.rng.randint(len(self.fuse_lst))]
        return self.rnd_lst[self.rng.randint(len(self.rnd_lst))]

    def _meta_rt(self, item_name: str) -> np.ndarray:
        meta = self.meta_lst[int(item_name)]
        if self.cls_id == 2:
            meta = next(m for m in meta if m["obj_id"] == 2)
        else:
            meta = meta[0]
        r = np.asarray(meta["cam_R_m2c"], np.float32).reshape(3, 3)
        t = np.asarray(meta["cam_t_m2c"], np.float32) / 1000.0
        return np.concatenate([r, t[:, None]], axis=1)

    def get_item(self, item_name: str):
        try:
            if "pkl" in item_name:
                with open(item_name, "rb") as f:
                    data = pickle.load(f)
                depth = np.asarray(data["depth"], np.float32)
                rgb = np.asarray(data["rgb"])[..., :3]
                labels = np.asarray(data["mask"])
                k = np.asarray(data["K"], np.float32)
                rt = np.asarray(data["RT"], np.float32)
                rnd_typ = data["rnd_typ"]
                if rnd_typ == "fuse":
                    labels = (labels == self.cls_id).astype(np.uint8)
                else:
                    labels = (labels > 0).astype(np.uint8)
                cam_scale = 1.0
            else:
                depth = _load_image(os.path.join(
                    self.cls_root, "depth", f"{item_name}.png")
                ).astype(np.float32)
                labels = (_load_image(os.path.join(
                    self.cls_root, "mask", f"{item_name}.png")) > 0
                ).astype(np.uint8)
                rgb = _load_image(os.path.join(
                    self.cls_root, "rgb", f"{item_name}.png"))[..., :3]
                rt = self._meta_rt(item_name)
                rnd_typ = "real"
                k = C.INTRINSICS["linemod"]
                cam_scale = 1000.0
        except (OSError, ValueError, KeyError):
            return None
        if labels.ndim > 2:
            labels = labels[..., 0]
        if self.add_noise and rnd_typ == "real":
            rgb = augment.color_jitter(self.rng, rgb.astype(np.uint8))
        # BGR order, matching the reference's ::-1 flip (:235).
        rgb = rgb[..., ::-1].astype(np.float32)

        if self.add_noise and rnd_typ == "render":
            rgb = augment.rgb_add_noise_lm(
                self.rng, np.clip(rgb, 0, 255).astype(np.uint8))
            rgb, depth = self._paste_real_background(rgb, labels, depth)
            if self.rng.rand() > 0.8:
                rgb = augment.rgb_add_noise_lm(
                    self.rng, np.clip(rgb, 0, 255).astype(np.uint8))
            rgb = rgb.astype(np.float32)

        kp_type = ("farthest" if self.spec.n_keypoints == 8
                   else f"farthest{self.spec.n_keypoints}")
        kps = get_kps(self.cls_type, kp_type=kp_type, ds_type="linemod")
        ctr = get_ctr(self.cls_type, ds_type="linemod")
        instances = [(1, rt, kps, ctr)]
        return build_frame(rgb, depth / cam_scale, labels, k, 1.0,
                           instances, self.spec, self.rng)

    def _paste_real_background(self, rgb, labels, depth):
        real_item = self.real_lst[self.rng.randint(len(self.real_lst))]
        try:
            back_depth = _load_image(os.path.join(
                self.cls_root, "depth", f"{real_item}.png"))
            back_label = _load_image(os.path.join(
                self.cls_root, "mask", f"{real_item}.png"))
            back_rgb = _load_image(os.path.join(
                self.cls_root, "rgb", f"{real_item}.png"))[..., :3]
        except (OSError, ValueError):
            return rgb, depth
        if back_label.ndim > 2:
            back_label = back_label[..., 0]
        back_rgb = back_rgb[..., ::-1]        # BGR like the foreground
        return augment.add_real_back(
            rgb, labels, depth.astype(np.float32), depth > 1e-6,
            back_rgb, back_depth, back_label)

    def __getitem__(self, idx: int):
        if self.split == "train":
            while True:
                data = self.get_item(self._pick_train_item())
                if data is not None:
                    return data
        return self.get_item(self.all_lst[idx])
