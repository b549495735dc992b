"""Convert torch checkpoints (torchvision ResNet-34, reference PVN3D) into
this framework's parameter trees.

The reference initializes its image trunk from torchvision's pretrained
resnet34 (pvn3d/lib/extractors.py:204-224, model-zoo download) and saves
training checkpoints as torch state dicts (train_ycb_pvn3d.py:102-129).
This module maps those tensors onto the flax module tree so pretrained /
reference-trained weights can seed parity runs.

Conventions:
  * torch Conv2d weight (O, I, kH, kW)  ->  flax (kH, kW, I, O);
  * torch Conv1d weight (O, I, 1) used as per-point MLPs -> Dense (I, O);
  * BatchNorm weight/bias -> params scale/bias; running stats ->
    batch_stats mean/var (f32).

Works on plain dict-of-numpy state dicts, so `torch.load(...,
map_location="cpu")` results convert without torch on the import path.
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0))


def _bn(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_resnet34(sd: Mapping, layers=(3, 4, 6, 3)) -> Dict:
    """torchvision resnet state_dict -> DilatedResNet {params, batch_stats}.

    Keys follow pvn3d_tpu.models.resnet.DilatedResNet naming
    (layer{s}_block{b}/{conv1,bn1,conv2,bn2,down_conv,down_bn}).
    """
    params: Dict = {"conv1": {"kernel": _conv(sd["conv1.weight"])}}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for s, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            name = f"layer{s}_block{b}"
            tp = f"layer{s}.{b}"
            blk_p: Dict = {
                "conv1": {"kernel": _conv(sd[f"{tp}.conv1.weight"])},
                "conv2": {"kernel": _conv(sd[f"{tp}.conv2.weight"])},
            }
            blk_s: Dict = {}
            blk_p["bn1"], blk_s["bn1"] = _bn(sd, f"{tp}.bn1")
            blk_p["bn2"], blk_s["bn2"] = _bn(sd, f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in sd:
                blk_p["down_conv"] = {
                    "kernel": _conv(sd[f"{tp}.downsample.0.weight"])}
                blk_p["down_bn"], blk_s["down_bn"] = _bn(
                    sd, f"{tp}.downsample.1")
            params[name] = blk_p
            stats[name] = blk_s
    return {"params": params, "batch_stats": stats}


def load_resnet34_into(variables: Dict, sd: Mapping,
                       trunk_path=("cnn", "trunk")) -> Dict:
    """Return a copy of model ``variables`` with the image trunk replaced by
    converted torchvision weights (reference behavior: extractors.py:215-224
    loads the pretrained trunk before training)."""
    import flax
    converted = convert_resnet34(sd)
    flat = flax.traverse_util.flatten_dict(variables)
    conv_flat = flax.traverse_util.flatten_dict(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]})
    out = dict(flat)
    n_replaced = 0
    for k, v in conv_flat.items():
        full = (k[0],) + tuple(trunk_path) + tuple(k[1:])
        if full in out:
            if out[full].shape != v.shape:
                raise ValueError(
                    f"shape mismatch at {full}: {out[full].shape} vs "
                    f"{v.shape}")
            out[full] = v
            n_replaced += 1
        else:
            raise KeyError(f"no target for converted tensor {full}")
    if n_replaced == 0:
        raise KeyError("no trunk tensors replaced — wrong trunk_path?")
    return flax.traverse_util.unflatten_dict(out)


def load_torch_state_dict(path: str) -> Dict:
    """Load a torch .pth/.pth.tar into a plain numpy dict (CPU)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state" in obj:   # reference ckpt
        obj = obj["model_state"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k.replace("module.", "", 1) if k.startswith("module.") else k:
            _np(v) for k, v in obj.items()}
