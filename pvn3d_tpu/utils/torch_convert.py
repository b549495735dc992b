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


def _dense(w) -> np.ndarray:
    """torch pointwise conv weight (O,I,1[,1]) -> flax Dense kernel (I,O)."""
    a = _np(w)
    a = a.reshape(a.shape[0], a.shape[1])
    return np.ascontiguousarray(a.T)


def convert_shared_mlp(sd: Mapping, prefix: str, n_layers: int
                       ) -> Tuple[Dict, Dict]:
    """etw SharedMLP (1x1 Conv2d + BN2d stacks, etw_pytorch_utils/
    pytorch_utils.py:25-50; keys ``{prefix}.layer{k}.conv.weight`` and
    ``{prefix}.layer{k}.normlayer.bn.*``) -> pvn3d_tpu SharedMLP
    (Dense_{k} / BatchNorm_{k}).  Convs are bias-free under BN."""
    params: Dict = {}
    stats: Dict = {}
    for k in range(n_layers):
        params[f"Dense_{k}"] = {
            "kernel": _dense(sd[f"{prefix}.layer{k}.conv.weight"])}
        bp, bs = _bn(sd, f"{prefix}.layer{k}.normlayer.bn")
        params[f"BatchNorm_{k}"] = bp
        stats[f"BatchNorm_{k}"] = bs
    return params, stats


def convert_head(sd: Mapping, prefix: str, n_hidden: int
                 ) -> Tuple[Dict, Dict]:
    """Seq conv1d head (pvn3d.py:245-267; keys ``{prefix}.{k}.conv.weight``,
    BN under ``.normlayer.bn``) -> PredictionHead (dense{k}/bn{k}/out).

    The reference's hidden convs are bias-free (BN follows); our Dense
    layers carry a bias param, so it is set to zeros."""
    params: Dict = {}
    stats: Dict = {}
    for k in range(n_hidden):
        kern = _dense(sd[f"{prefix}.{k}.conv.weight"])
        params[f"dense{k}"] = {"kernel": kern,
                               "bias": np.zeros(kern.shape[1], np.float32)}
        bp, bs = _bn(sd, f"{prefix}.{k}.normlayer.bn")
        params[f"bn{k}"] = bp
        stats[f"bn{k}"] = bs
    params["out"] = {"kernel": _dense(sd[f"{prefix}.{n_hidden}.conv.weight"]),
                     "bias": _np(sd[f"{prefix}.{n_hidden}.conv.bias"])}
    return params, stats


def convert_psp(sd: Mapping, prefix: str, sizes=(1, 2, 3, 6)
                ) -> Dict:
    """PSPModule (pspnet.py:7-31): per-size 1x1 convs (bias-free, inside
    ``stages.{i}`` Sequentials at index 1) + biased bottleneck."""
    params: Dict = {}
    for i, s in enumerate(sizes):
        params[f"stage{s}"] = {
            "kernel": _conv(sd[f"{prefix}.stages.{i}.1.weight"])}
    params["bottleneck"] = {
        "kernel": _conv(sd[f"{prefix}.bottleneck.weight"]),
        "bias": _np(sd[f"{prefix}.bottleneck.bias"])}
    return params


def convert_upsample(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    """PSPUpsample (pspnet.py:34-45): ``{prefix}.conv`` is a Sequential
    [Upsample, Conv2d, BatchNorm2d, PReLU] -> conv/bn/prelu submodules."""
    params: Dict = {"conv": {"kernel": _conv(sd[f"{prefix}.conv.1.weight"]),
                             "bias": _np(sd[f"{prefix}.conv.1.bias"])}}
    stats: Dict = {}
    params["bn"], stats["bn"] = _bn(sd, f"{prefix}.conv.2")
    params["prelu"] = {"alpha": _np(sd[f"{prefix}.conv.3.weight"])}
    return params, stats


def convert_fusion(sd: Mapping, prefix: str = "rgbd_feat") -> Dict:
    """DenseFusion conv1ds (pvn3d.py:157-182) -> fusion Dense layers."""
    params: Dict = {}
    for name in ("conv2_rgb", "conv2_cld", "conv3", "conv4"):
        params[name] = {"kernel": _dense(sd[f"{prefix}.{name}.weight"]),
                        "bias": _np(sd[f"{prefix}.{name}.bias"])}
    return params


def convert_pvn3d(sd: Mapping, n_sa_levels: int = 4, n_scales: int = 2,
                  sa_mlp_layers: int = 3, fp_mlp_layers: int = 2,
                  head_hidden: int = 3, psp_sizes=(1, 2, 3, 6),
                  n_up: int = 3) -> Dict:
    """Full reference PVN3D state dict -> this framework's variable tree.

    Maps every live-path block of pvn3d/lib/pvn3d.py:210-267:
      * ``cnn.model.feats.*``      -> cnn/trunk     (extractors.py ResNet34)
      * ``cnn.model.psp.*``        -> cnn/psp       (pspnet.py:7-31)
      * ``cnn.model.up_{k}.*``     -> cnn/up{k}     (pspnet.py:34-45)
      * ``cnn.model.final*.*``     -> cnn/final, cnn/final_seg
      * ``pointnet2.SA_modules.*`` -> pointnet2/sa{i}/mlp{j} (pvn3d.py:67-112)
      * ``pointnet2.FP_modules.*`` -> pointnet2/fp{i}/mlp    (pvn3d.py:115-118)
      * ``rgbd_feat.*``            -> fusion        (pvn3d.py:157-182)
      * ``SEG/KpOF/CtrOf_layer.*`` -> seg/kp/ctr_head (pvn3d.py:245-267)
    The dead classifier head (pspnet.py:71-75, never called by
    Modified_PSPNet.forward) is intentionally dropped.

    Returns {"params": ..., "batch_stats": ...} ready for ``model.apply``.
    """
    trunk_sd = {k[len("cnn.model.feats."):]: v for k, v in sd.items()
                if k.startswith("cnn.model.feats.")}
    trunk = convert_resnet34(trunk_sd)

    cnn_p: Dict = {"trunk": trunk["params"]}
    cnn_s: Dict = {"trunk": trunk["batch_stats"]}
    cnn_p["psp"] = convert_psp(sd, "cnn.model.psp", psp_sizes)
    for k in range(1, n_up + 1):
        cnn_p[f"up{k}"], cnn_s[f"up{k}"] = convert_upsample(
            sd, f"cnn.model.up_{k}")
    cnn_p["final"] = {"kernel": _conv(sd["cnn.model.final.0.weight"]),
                      "bias": _np(sd["cnn.model.final.0.bias"])}
    cnn_p["final_seg"] = {
        "kernel": _conv(sd["cnn.model.final_seg.0.weight"]),
        "bias": _np(sd["cnn.model.final_seg.0.bias"])}

    pn_p: Dict = {}
    pn_s: Dict = {}
    for i in range(n_sa_levels):
        sa_p: Dict = {}
        sa_s: Dict = {}
        for j in range(n_scales):
            sa_p[f"mlp{j}"], sa_s[f"mlp{j}"] = convert_shared_mlp(
                sd, f"pointnet2.SA_modules.{i}.mlps.{j}", sa_mlp_layers)
        pn_p[f"sa{i}"] = sa_p
        pn_s[f"sa{i}"] = sa_s
    for i in range(n_sa_levels):
        # FP_modules[i] runs at our fp{i}: the reference applies them in
        # reversed index order (pvn3d.py:149-152) and we name ours by level,
        # so indices align directly.
        mp, ms = convert_shared_mlp(sd, f"pointnet2.FP_modules.{i}.mlp",
                                    fp_mlp_layers)
        pn_p[f"fp{i}"] = {"mlp": mp}
        pn_s[f"fp{i}"] = {"mlp": ms}

    params: Dict = {"cnn": cnn_p, "pointnet2": pn_p,
                    "fusion": convert_fusion(sd)}
    stats: Dict = {"cnn": cnn_s, "pointnet2": pn_s}
    for torch_name, ours in (("SEG_layer", "seg_head"),
                             ("KpOF_layer", "kp_head"),
                             ("CtrOf_layer", "ctr_head")):
        params[ours], stats[ours] = convert_head(sd, torch_name, head_hidden)
    return {"params": params, "batch_stats": stats}


def load_pvn3d_into(variables: Dict, sd: Mapping) -> Dict:
    """Replace every tensor of a PVN3D variable tree with the converted
    reference checkpoint, validating structure + shapes both ways."""
    import flax
    converted = convert_pvn3d(sd)
    tgt = flax.traverse_util.flatten_dict(variables)
    src = flax.traverse_util.flatten_dict(converted)
    missing = sorted(set(map("/".join, tgt)) - set(map("/".join, src)))
    extra = sorted(set(map("/".join, src)) - set(map("/".join, tgt)))
    if missing or extra:
        raise KeyError(f"tree mismatch: missing={missing[:8]} "
                       f"extra={extra[:8]}")
    out = {}
    for k, v in src.items():
        if tuple(np.shape(tgt[k])) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {'/'.join(k)}: "
                             f"{np.shape(tgt[k])} vs {v.shape}")
        out[k] = v
    return flax.traverse_util.unflatten_dict(out)


def load_state_from_torch(state, path: str, *, trunk_only: bool = False):
    """Return ``state`` with params/batch_stats replaced from a torch
    checkpoint: either a full reference PVN3D checkpoint
    (train_ycb_pvn3d.py:102-146 tar layout) or, with ``trunk_only``, a
    torchvision resnet34 state dict seeding just the image trunk (the
    reference's pretrained init, extractors.py:215-224)."""
    import jax
    sd = load_torch_state_dict(path)
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    new = (load_resnet34_into(variables, sd) if trunk_only
           else load_pvn3d_into(variables, sd))
    return state.replace(params=new["params"],
                         batch_stats=new["batch_stats"])


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
