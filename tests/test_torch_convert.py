"""Torch -> flax weight conversion: numerics vs torch ops, full-trunk load."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pvn3d_tpu.models.resnet import DilatedResNet
from pvn3d_tpu.utils.torch_convert import (convert_resnet34,
                                           load_resnet34_into)

torch = pytest.importorskip("torch")


def _fake_resnet34_sd(rng):
    """torchvision-resnet34-shaped random state dict."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.tensor(
            rng.randn(o, i, k, k).astype(np.float32) * 0.05)

    def bn(name, c):
        sd[name + ".weight"] = torch.tensor(rng.rand(c).astype(np.float32))
        sd[name + ".bias"] = torch.tensor(rng.randn(c).astype(np.float32))
        sd[name + ".running_mean"] = torch.tensor(
            rng.randn(c).astype(np.float32) * 0.1)
        sd[name + ".running_var"] = torch.tensor(
            rng.rand(c).astype(np.float32) + 0.5)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    layers = [(1, 64, 3), (2, 128, 4), (3, 256, 6), (4, 512, 3)]
    in_c = 64
    for s, c, n in layers:
        for b in range(n):
            p = f"layer{s}.{b}"
            conv(p + ".conv1", c, in_c if b == 0 else c, 3)
            bn(p + ".bn1", c)
            conv(p + ".conv2", c, c, 3)
            bn(p + ".bn2", c)
            if b == 0 and in_c != c:
                conv(p + ".downsample.0", c, in_c, 1)
                bn(p + ".downsample.1", c)
        in_c = c
    return sd


def test_first_conv_matches_torch():
    rng = np.random.RandomState(0)
    sd = _fake_resnet34_sd(rng)
    conv = convert_resnet34(sd)["params"]["conv1"]["kernel"]   # (7,7,3,64)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.tensor(x), sd["conv1.weight"], stride=2, padding=3
        ).numpy()
    got = jax.lax.conv_general_dilated(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(conv),
        window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, atol=1e-4)


def test_full_trunk_load_and_forward():
    rng = np.random.RandomState(1)
    sd = _fake_resnet34_sd(rng)
    model = DilatedResNet(train=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    loaded = load_resnet34_into(variables, sd, trunk_path=())
    # Every trunk conv kernel must now equal the converted tensor.
    k = np.asarray(loaded["params"]["layer3_block2"]["conv1"]["kernel"])
    want = np.transpose(sd["layer3.2.conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(k, want)
    # BN stats landed in batch_stats.
    m = np.asarray(loaded["batch_stats"]["layer1_block0"]["bn1"]["mean"])
    np.testing.assert_allclose(m, sd["layer1.0.bn1.running_mean"].numpy())
    # And the model still runs with the loaded weights.
    out = model.apply(loaded, jnp.asarray(
        rng.randn(1, 64, 64, 3).astype(np.float32) * 0.1))
    assert out.shape == (1, 8, 8, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_shape_mismatch_raises():
    rng = np.random.RandomState(2)
    sd = _fake_resnet34_sd(rng)
    sd["conv1.weight"] = torch.zeros(64, 4, 7, 7)
    model = DilatedResNet(train=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError):
        load_resnet34_into(variables, sd, trunk_path=())


# ---------------------------------------------------------------------------
# Full PVN3D checkpoint conversion (round-2): per-block torch-vs-flax
# numerics + whole-tree structure.  The torch modules below replicate the
# reference's layer structure and state-dict key naming
# (pvn3d/lib/pvn3d.py:210-267, lib/pspnet.py:7-90,
# etw_pytorch_utils/pytorch_utils.py:25-135) so conversion is validated
# against real torch forward passes without needing the reference package.
# ---------------------------------------------------------------------------
from pvn3d_tpu.config import ModelConfig
from pvn3d_tpu.models.layers import PReLU, BatchNorm, SharedMLP
from pvn3d_tpu.models.pspnet import PSPModule, PSPUpsample
from pvn3d_tpu.models.pvn3d import PVN3D, DenseFusion, PredictionHead
from pvn3d_tpu.utils.torch_convert import (
    convert_fusion, convert_head, convert_psp, convert_pvn3d,
    convert_shared_mlp, convert_upsample, load_pvn3d_into)

_t = torch.nn


class _BNWrap(_t.Module):
    """etw _BNBase: a wrapper whose child is named ``bn``."""

    def __init__(self, bn):
        super().__init__()
        self.bn = bn


class _EtwConv(_t.Module):
    """etw Conv1d/Conv2d: children ``conv`` and (if bn) ``normlayer.bn``."""

    def __init__(self, conv, bn=None):
        super().__init__()
        self.conv = conv
        if bn is not None:
            self.normlayer = _BNWrap(bn)

    def forward(self, x, act=True):
        x = self.conv(x)
        if hasattr(self, "normlayer"):
            x = self.normlayer.bn(x)
        return torch.relu(x) if act else x


def _randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.rand(bn.num_features) + 0.5))
        bn.bias.copy_(torch.tensor(rng.randn(bn.num_features) * 0.1))
        bn.running_mean.copy_(torch.tensor(rng.randn(bn.num_features) * 0.1))
        bn.running_var.copy_(torch.tensor(rng.rand(bn.num_features) + 0.5))
    return bn


def _shared_mlp_torch(widths, in_c, rng):
    layers = []
    c = in_c
    for w in widths:
        conv = _t.Conv2d(c, w, 1, bias=False)
        bn = _randomize_bn(_t.BatchNorm2d(w), rng)
        layers.append(_EtwConv(conv, bn))
        c = w
    mod = _t.Module()
    for k, l in enumerate(layers):
        mod.add_module(f"layer{k}", l)
    return mod, layers


def test_shared_mlp_matches_torch():
    rng = np.random.RandomState(3)
    widths, in_c = (16, 16, 32), 9
    mod, layers = _shared_mlp_torch(widths, in_c, rng)
    sd = {f"m.{k}": v for k, v in mod.state_dict().items()}
    params, stats = convert_shared_mlp(sd, "m", len(widths))

    x = rng.randn(2, in_c, 8, 4).astype(np.float32)
    with torch.no_grad():
        ref = torch.tensor(x)
        for l in layers:
            l.eval()
            ref = l(ref)
        ref = ref.numpy()

    flax_mod = SharedMLP(widths, train=False)
    got = flax_mod.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, atol=2e-5)


def test_head_matches_torch():
    rng = np.random.RandomState(4)
    widths, in_c, out = (64, 32, 16), 48, 5
    mod = _t.Module()
    c = in_c
    seq = []
    for k, w in enumerate(widths):
        l = _EtwConv(_t.Conv1d(c, w, 1, bias=False),
                     _randomize_bn(_t.BatchNorm1d(w), rng))
        mod.add_module(str(k), l)
        seq.append((l, True))
        c = w
    last = _EtwConv(_t.Conv1d(c, out, 1, bias=True))
    mod.add_module(str(len(widths)), last)
    seq.append((last, False))
    sd = {f"H.{k}": v for k, v in mod.state_dict().items()}
    params, stats = convert_head(sd, "H", len(widths))

    x = rng.randn(2, in_c, 11).astype(np.float32)
    with torch.no_grad():
        ref = torch.tensor(x)
        for l, act in seq:
            l.eval()
            ref = l(ref, act=act)
        ref = ref.numpy()

    head = PredictionHead(widths, out, train=False)
    got = head.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(np.transpose(x, (0, 2, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 2, 1)),
                               ref, atol=2e-5)


def test_fusion_matches_torch():
    rng = np.random.RandomState(5)
    conv2_rgb = _t.Conv1d(128, 256, 1)
    conv2_cld = _t.Conv1d(128, 256, 1)
    conv3 = _t.Conv1d(256, 512, 1)
    conv4 = _t.Conv1d(512, 1024, 1)
    mod = _t.Module()
    for n, m in (("conv2_rgb", conv2_rgb), ("conv2_cld", conv2_cld),
                 ("conv3", conv3), ("conv4", conv4)):
        mod.add_module(n, m)
    sd = {f"rgbd_feat.{k}": v for k, v in mod.state_dict().items()}
    params = convert_fusion(sd)

    n_pts = 7
    rgb = rng.randn(2, 128, n_pts).astype(np.float32)
    cld = rng.randn(2, 128, n_pts).astype(np.float32)
    with torch.no_grad():
        tr, tc = torch.tensor(rgb), torch.tensor(cld)
        feat_1 = torch.cat((tr, tc), dim=1)
        r = torch.relu(conv2_rgb(tr))
        c = torch.relu(conv2_cld(tc))
        feat_2 = torch.cat((r, c), dim=1)
        rgbd = torch.relu(conv4(torch.relu(conv3(feat_1))))
        ap = rgbd.mean(dim=2, keepdim=True).repeat(1, 1, n_pts)
        ref = torch.cat([feat_1, feat_2, ap], 1).numpy()

    fusion = DenseFusion(train=False)
    got = fusion.apply({"params": params},
                       jnp.asarray(np.transpose(rgb, (0, 2, 1))),
                       jnp.asarray(np.transpose(cld, (0, 2, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 2, 1)),
                               ref, atol=2e-5)


def test_psp_module_matches_torch():
    rng = np.random.RandomState(6)
    feats, sizes, out_f = 32, (1, 2, 3, 6), 24
    stages = [_t.Conv2d(feats, feats, 1, bias=False) for _ in sizes]
    bottleneck = _t.Conv2d(feats * (len(sizes) + 1), out_f, 1)
    mod = _t.Module()
    st = _t.Module()
    for i, s in enumerate(stages):
        wrap = _t.Module()
        wrap.add_module("1", s)
        st.add_module(str(i), wrap)
    mod.add_module("stages", st)
    mod.add_module("bottleneck", bottleneck)
    sd = {f"psp.{k}": v for k, v in mod.state_dict().items()}
    params = convert_psp(sd, "psp", sizes)

    x = rng.randn(1, feats, 12, 16).astype(np.float32)
    with torch.no_grad():
        t = torch.tensor(x)
        h, w = t.shape[2], t.shape[3]
        priors = [
            torch.nn.functional.interpolate(
                conv(torch.nn.functional.adaptive_avg_pool2d(t, (s, s))),
                size=(h, w), mode="bilinear", align_corners=False)
            for s, conv in zip(sizes, stages)] + [t]
        ref = torch.relu(bottleneck(torch.cat(priors, 1))).numpy()

    psp = PSPModule(out_features=out_f, sizes=sizes)
    got = psp.apply({"params": params},
                    jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, atol=2e-5)


def test_psp_upsample_matches_torch():
    rng = np.random.RandomState(7)
    in_c, out_c = 12, 10
    conv = _t.Conv2d(in_c, out_c, 3, padding=1)
    bn = _randomize_bn(_t.BatchNorm2d(out_c), rng)
    prelu = _t.PReLU()
    with torch.no_grad():
        prelu.weight.fill_(0.17)
    mod = _t.Module()
    seq = _t.Module()
    seq.add_module("1", conv)
    seq.add_module("2", bn)
    seq.add_module("3", prelu)
    mod.add_module("conv", seq)
    sd = {f"up_1.{k}": v for k, v in mod.state_dict().items()}
    params, stats = convert_upsample(sd, "up_1")

    x = rng.randn(1, in_c, 6, 9).astype(np.float32)
    with torch.no_grad():
        bn.eval()
        t = torch.nn.functional.interpolate(
            torch.tensor(x), scale_factor=2, mode="bilinear",
            align_corners=True)
        ref = prelu(bn(conv(t))).numpy()

    up = PSPUpsample(features=out_c, train=False)
    got = up.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, atol=2e-5)


def _fake_pvn3d_sd(rng, cfg: ModelConfig):
    """Random state dict with the reference PVN3D's exact key set/shapes."""
    sd = _fake_resnet34_sd(rng)
    sd = {f"cnn.model.feats.{k}": v for k, v in sd.items()}

    def conv2d(name, o, i, k=1, bias=True):
        sd[f"{name}.weight"] = torch.tensor(
            rng.randn(o, i, k, k).astype(np.float32) * 0.05)
        if bias:
            sd[f"{name}.bias"] = torch.tensor(
                rng.randn(o).astype(np.float32) * 0.05)

    def conv1d(name, o, i, bias=True):
        sd[f"{name}.weight"] = torch.tensor(
            rng.randn(o, i, 1).astype(np.float32) * 0.05)
        if bias:
            sd[f"{name}.bias"] = torch.tensor(
                rng.randn(o).astype(np.float32) * 0.05)

    def bn(name, c):
        sd[f"{name}.weight"] = torch.tensor(rng.rand(c).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(rng.randn(c).astype(np.float32))
        sd[f"{name}.running_mean"] = torch.tensor(
            rng.randn(c).astype(np.float32) * 0.1)
        sd[f"{name}.running_var"] = torch.tensor(
            rng.rand(c).astype(np.float32) + 0.5)

    ccfg = cfg.cnn
    for i, _ in enumerate(ccfg.psp_sizes):
        conv2d(f"cnn.model.psp.stages.{i}.1", ccfg.psp_features,
               ccfg.psp_features, bias=False)
    conv2d("cnn.model.psp.bottleneck",
           ccfg.psp_out, ccfg.psp_features * (len(ccfg.psp_sizes) + 1))
    c = ccfg.psp_out
    for k, w in enumerate(ccfg.up_channels, start=1):
        conv2d(f"cnn.model.up_{k}.conv.1", w, c, k=3)
        bn(f"cnn.model.up_{k}.conv.2", w)
        sd[f"cnn.model.up_{k}.conv.3.weight"] = torch.tensor(
            np.full((1,), 0.25, np.float32))
        c = w
    conv2d("cnn.model.final.0", ccfg.embedding_dim, c)
    conv2d("cnn.model.final_seg.0", cfg.n_classes, c)

    pcfg = cfg.pointnet2
    c_in = pcfg.input_channels
    for i, lvl in enumerate(pcfg.sa_levels):
        for j, widths in enumerate(lvl.mlps):
            cc = c_in + (3 if pcfg.use_xyz else 0)
            for k, w in enumerate(widths):
                conv2d(f"pointnet2.SA_modules.{i}.mlps.{j}.layer{k}.conv",
                       w, cc, bias=False)
                bn(f"pointnet2.SA_modules.{i}.mlps.{j}.layer{k}"
                   ".normlayer.bn", w)
                cc = w
        c_in = sum(w[-1] for w in lvl.mlps)
    skips = [pcfg.input_channels] + [
        sum(w[-1] for w in lvl.mlps) for lvl in pcfg.sa_levels]
    for i, widths in enumerate(pcfg.fp_mlps):
        # fp{i} consumes the fp{i+1}-processed coarser features (the topmost
        # level consumes the raw SA output) concatenated with its skip.
        known = (pcfg.fp_mlps[i + 1][-1] if i < len(pcfg.fp_mlps) - 1
                 else skips[i + 1])
        cc = skips[i] + known
        for k, w in enumerate(widths):
            conv2d(f"pointnet2.FP_modules.{i}.mlp.layer{k}.conv", w, cc,
                   bias=False)
            bn(f"pointnet2.FP_modules.{i}.mlp.layer{k}.normlayer.bn", w)
            cc = w

    conv1d("rgbd_feat.conv2_rgb", 256, 128)
    conv1d("rgbd_feat.conv2_cld", 256, 128)
    conv1d("rgbd_feat.conv3", 512, 256)
    conv1d("rgbd_feat.conv4", 1024, 512)

    for torch_name, widths, out in (
            ("SEG_layer", cfg.seg_head, cfg.n_classes),
            ("KpOF_layer", cfg.kp_head, cfg.n_keypoints * 3),
            ("CtrOf_layer", cfg.ctr_head, 3)):
        cc = cfg.fusion_dim
        for k, w in enumerate(widths):
            conv1d(f"{torch_name}.{k}.conv", w, cc, bias=False)
            bn(f"{torch_name}.{k}.normlayer.bn", w)
            cc = w
        conv1d(f"{torch_name}.{len(widths)}.conv", out, cc)
    return sd


def test_full_checkpoint_converts_into_model_tree():
    cfg = ModelConfig()
    rng = np.random.RandomState(8)
    sd = _fake_pvn3d_sd(rng, cfg)
    model = PVN3D(cfg=cfg, train=False)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4096, 9), jnp.float32),
            jnp.zeros((1, 96, 128, 3), jnp.float32),
            jnp.zeros((1, 4096), jnp.int32)))
    loaded = load_pvn3d_into(shapes, sd)
    # Spot checks: a deep SA tensor and a head out bias round-trip exactly.
    got = loaded["params"]["pointnet2"]["sa2"]["mlp1"]["Dense_2"]["kernel"]
    want = sd["pointnet2.SA_modules.2.mlps.1.layer2.conv.weight"]
    np.testing.assert_allclose(
        got, want.numpy()[:, :, 0, 0].T)
    np.testing.assert_allclose(
        loaded["params"]["kp_head"]["out"]["bias"],
        sd["KpOF_layer.3.conv.bias"].numpy())
    np.testing.assert_allclose(
        loaded["batch_stats"]["cnn"]["up2"]["bn"]["var"],
        sd["cnn.model.up_2.conv.2.running_var"].numpy())


def test_full_checkpoint_shape_mismatch_raises():
    cfg = ModelConfig()
    rng = np.random.RandomState(9)
    sd = _fake_pvn3d_sd(rng, cfg)
    sd["rgbd_feat.conv3.weight"] = torch.zeros(512, 300, 1)
    model = PVN3D(cfg=cfg, train=False)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4096, 9), jnp.float32),
            jnp.zeros((1, 96, 128, 3), jnp.float32),
            jnp.zeros((1, 4096), jnp.int32)))
    with pytest.raises(ValueError):
        load_pvn3d_into(shapes, sd)


def test_train_state_trunk_seeding(tmp_path):
    """--pretrained_trunk path: state params get the converted torchvision
    trunk (reference behavior: extractors.py:215-224)."""
    import __graft_entry__ as graft
    from pvn3d_tpu.data.synthetic import synthetic_batch
    from pvn3d_tpu.train.state import create_train_state
    from pvn3d_tpu.utils.torch_convert import (convert_resnet34,
                                               load_state_from_torch)

    cfg = graft._tiny_config()
    batch = synthetic_batch(cfg, batch_size=2,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch)

    rng = np.random.RandomState(11)
    sd = _fake_resnet34_sd(rng)
    path = str(tmp_path / "resnet34.pth")
    torch.save(sd, path)

    seeded = load_state_from_torch(state, path, trunk_only=True)
    conv = convert_resnet34(sd)
    trunk = seeded.params["cnn"]["trunk"]
    np.testing.assert_allclose(
        np.asarray(trunk["layer2_block1"]["conv1"]["kernel"]),
        conv["params"]["layer2_block1"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(seeded.batch_stats["cnn"]["trunk"]["bn1"]["var"]),
        conv["batch_stats"]["bn1"]["var"])
    # Non-trunk params untouched.
    np.testing.assert_allclose(
        np.asarray(seeded.params["fusion"]["conv3"]["kernel"]),
        np.asarray(state.params["fusion"]["conv3"]["kernel"]))


# ---------------------------------------------------------------------------
# Composite converter proof (round-4): the FULL reference-architecture torch
# model assembled from the same torch primitives as the per-block tests
# above, run end-to-end (pvn3d/lib/pvn3d.py:269-310 forward semantics), and
# compared against the converted flax model's full forward.  Per-block tests
# cannot catch inter-block wiring errors (FP application order, fusion input
# order, head reshape/permute, gather layout) — this one fails on any of
# them.  Point-op index decisions on the torch side come from the numpy
# oracles of tests/test_ops.py (proven to match the exact-mode jnp ops
# bit-for-bit), so any output mismatch is wiring/numerics, not selection.
# ---------------------------------------------------------------------------
import dataclasses

from pvn3d_tpu.config import PointNet2Config
from tests.test_ops import np_fps, np_three_nn

_F = torch.nn.functional


def _t_bn(x, sd, p):
    return _F.batch_norm(x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
                         sd[f"{p}.weight"], sd[f"{p}.bias"], training=False)


def _t_resnet34_s8(sd, x, prefix="cnn.model.feats"):
    """Stride-8 ResNet-34 trunk forward (extractors.py:108-224 semantics:
    layers 3/4 stride 1; the dilation argument is dead code — see
    models/resnet.py docstring)."""
    x = _F.conv2d(x, sd[f"{prefix}.conv1.weight"], stride=2, padding=3)
    x = _F.relu(_t_bn(x, sd, f"{prefix}.bn1"))
    x = _F.max_pool2d(x, 3, stride=2, padding=1)
    for s, n_blocks, stride in ((1, 3, 1), (2, 4, 2), (3, 6, 1), (4, 3, 1)):
        for b in range(n_blocks):
            p = f"{prefix}.layer{s}.{b}"
            st = stride if b == 0 else 1
            y = _F.conv2d(x, sd[f"{p}.conv1.weight"], stride=st, padding=1)
            y = _F.relu(_t_bn(y, sd, f"{p}.bn1"))
            y = _F.conv2d(y, sd[f"{p}.conv2.weight"], padding=1)
            y = _t_bn(y, sd, f"{p}.bn2")
            res = x
            if f"{p}.downsample.0.weight" in sd:
                res = _F.conv2d(x, sd[f"{p}.downsample.0.weight"], stride=st)
                res = _t_bn(res, sd, f"{p}.downsample.1")
            x = _F.relu(y + res)
    return x


def _t_cnn_embedding(sd, cfg, rgb):
    """Modified_PSPNet forward (pspnet.py:48-90): trunk -> PSP -> 3x
    upsample -> 128-d embedding map (the final_seg head is computed-and-
    unused in the reference; dropped here)."""
    f = _t_resnet34_s8(sd, rgb)
    h, w = f.shape[2], f.shape[3]
    priors = []
    for i, s in enumerate(cfg.cnn.psp_sizes):
        p = _F.adaptive_avg_pool2d(f, (s, s))
        p = _F.conv2d(p, sd[f"cnn.model.psp.stages.{i}.1.weight"])
        priors.append(_F.interpolate(p, size=(h, w), mode="bilinear",
                                     align_corners=False))
    priors.append(f)
    y = _F.relu(_F.conv2d(torch.cat(priors, 1),
                          sd["cnn.model.psp.bottleneck.weight"],
                          sd["cnn.model.psp.bottleneck.bias"]))
    for k in range(1, len(cfg.cnn.up_channels) + 1):
        y = _F.interpolate(y, scale_factor=2, mode="bilinear",
                           align_corners=True)
        y = _F.conv2d(y, sd[f"cnn.model.up_{k}.conv.1.weight"],
                      sd[f"cnn.model.up_{k}.conv.1.bias"], padding=1)
        y = _t_bn(y, sd, f"cnn.model.up_{k}.conv.2")
        y = _F.prelu(y, sd[f"cnn.model.up_{k}.conv.3.weight"])
    return _F.conv2d(y, sd["cnn.model.final.0.weight"],
                     sd["cnn.model.final.0.bias"])


def _np_ball_query_fast(radius, ns, xyz, centroids):
    """Vectorized twin of tests.test_ops.np_ball_query (reference
    semantics, ball_query_gpu.cu:26-43): first ns in index order with
    d^2 < r^2, pad with the first hit, all-zeros when empty."""
    d2 = ((centroids[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    hit = d2 < np.float32(radius * radius)
    n = xyz.shape[0]
    order = np.where(hit, np.arange(n, dtype=np.int64)[None, :], n)
    first_k = np.sort(order, axis=1)[:, :ns]
    cnt = hit.sum(1)
    ks = np.arange(ns, dtype=np.int64)[None, :]
    out = np.where(ks < np.maximum(cnt[:, None], 1), first_k, first_k[:, :1])
    return np.where(cnt[:, None] == 0, 0, out).astype(np.int32)


def _t_shared_mlp(sd, prefix, n_layers, x):
    for k in range(n_layers):
        x = _F.conv2d(x, sd[f"{prefix}.layer{k}.conv.weight"])
        x = _F.relu(_t_bn(x, sd, f"{prefix}.layer{k}.normlayer.bn"))
    return x


def _t_pointnet2(sd, pcfg, pcld):
    """Pointnet2MSG forward (pvn3d.py:126-154 + pointnet2_modules.py:27-206)
    with index decisions from the numpy oracles.  pcld: (N, 9) numpy."""
    xyz = np.ascontiguousarray(pcld[:, :3], np.float32)
    l_xyz = [xyz]
    l_feats = [np.ascontiguousarray(pcld[:, 3:], np.float32)]
    for i, lvl in enumerate(pcfg.sa_levels):
        cur_xyz, cur_f = l_xyz[i], l_feats[i]
        new_xyz = cur_xyz[np_fps(cur_xyz, lvl.npoint)]
        outs = []
        for j, (r, ns, widths) in enumerate(
                zip(lvl.radii, lvl.nsamples, lvl.mlps)):
            g_idx = _np_ball_query_fast(r, ns, cur_xyz, new_xyz)
            g_xyz = cur_xyz[g_idx] - new_xyz[:, None, :]
            grouped = np.concatenate([g_xyz, cur_f[g_idx]], -1)
            t = torch.tensor(np.transpose(grouped, (2, 0, 1))[None])
            t = _t_shared_mlp(sd, f"pointnet2.SA_modules.{i}.mlps.{j}",
                              len(widths), t)
            outs.append(t.max(dim=3)[0])
        l_xyz.append(new_xyz)
        l_feats.append(torch.cat(outs, 1)[0].numpy().T.copy())
    # Coarsest-to-finest FP (pvn3d.py:149-152: FP_modules applied in
    # reversed index order).
    for i in range(len(pcfg.sa_levels) - 1, -1, -1):
        dist, idx = np_three_nn(l_xyz[i], l_xyz[i + 1])
        recip = 1.0 / (dist + 1e-8)
        w = (recip / recip.sum(1, keepdims=True)).astype(np.float32)
        interp = (l_feats[i + 1][idx] * w[..., None]).sum(1)
        cat = np.concatenate([interp, l_feats[i]], -1).astype(np.float32)
        t = torch.tensor(cat.T[None, :, :, None])
        t = _t_shared_mlp(sd, f"pointnet2.FP_modules.{i}.mlp",
                          len(pcfg.fp_mlps[i]), t)
        l_feats[i] = t[0, :, :, 0].numpy().T.copy()
    return l_feats[0]                                     # (N, 128)


def _t_pvn3d_forward(sd, cfg, pcld, rgb, choose):
    """Full reference forward (pvn3d.py:269-310): returns
    (pred_kp_of (1,n_kps,N,3), pred_rgbd_seg (1,N,n_cls),
     pred_ctr_of (1,1,N,3)) as numpy."""
    n = pcld.shape[0]
    with torch.no_grad():
        emb = _t_cnn_embedding(sd, cfg, torch.tensor(rgb[None]))
        bs, di = emb.shape[0], emb.shape[1]
        rgb_emb = torch.gather(
            emb.reshape(bs, di, -1), 2,
            torch.tensor(choose[None, None, :].astype(np.int64)).repeat(
                1, di, 1))
        cld_emb = torch.tensor(_t_pointnet2(sd, cfg.pointnet2, pcld).T[None])
        # DenseFusion (pvn3d.py:157-182).
        feat_1 = torch.cat([rgb_emb, cld_emb], dim=1)
        r = _F.relu(_F.conv1d(rgb_emb, sd["rgbd_feat.conv2_rgb.weight"],
                              sd["rgbd_feat.conv2_rgb.bias"]))
        c = _F.relu(_F.conv1d(cld_emb, sd["rgbd_feat.conv2_cld.weight"],
                              sd["rgbd_feat.conv2_cld.bias"]))
        feat_2 = torch.cat([r, c], dim=1)
        rgbd = _F.relu(_F.conv1d(feat_1, sd["rgbd_feat.conv3.weight"],
                                 sd["rgbd_feat.conv3.bias"]))
        rgbd = _F.relu(_F.conv1d(rgbd, sd["rgbd_feat.conv4.weight"],
                                 sd["rgbd_feat.conv4.bias"]))
        ap = rgbd.mean(dim=2, keepdim=True).repeat(1, 1, n)
        fused = torch.cat([feat_1, feat_2, ap], 1)

        def head(prefix, widths):
            x = fused
            for k in range(len(widths)):
                x = _F.conv1d(x, sd[f"{prefix}.{k}.conv.weight"])
                x = _F.relu(_t_bn(x, sd, f"{prefix}.{k}.normlayer.bn"))
            return _F.conv1d(x, sd[f"{prefix}.{len(widths)}.conv.weight"],
                             sd[f"{prefix}.{len(widths)}.conv.bias"])

        seg = head("SEG_layer", cfg.seg_head).transpose(1, 2)
        kp = head("KpOF_layer", cfg.kp_head).view(
            1, cfg.n_keypoints, 3, n).permute(0, 1, 3, 2)
        ctr = head("CtrOf_layer", cfg.ctr_head).view(
            1, 1, 3, n).permute(0, 1, 3, 2)
    return kp.numpy(), seg.numpy(), ctr.numpy()


def test_composite_full_forward_matches_torch():
    """One composite forward: random reference checkpoint -> convert ->
    flax PVN3D(eval) vs the torch reference architecture, end to end."""
    cfg = ModelConfig(
        compute_dtype="float32",
        pointnet2=PointNet2Config(query_mode="exact", interp_mode="exact"))
    rng = np.random.RandomState(12)
    sd = _fake_pvn3d_sd(rng, cfg)

    n, h, w = 4096, 96, 128
    # Depth-camera-ish cloud: dense enough that the small SA radii
    # (0.0175 m) actually collect neighbors.
    xyz = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.3
    feats = rng.randn(n, 6).astype(np.float32) * 0.5
    pcld = np.concatenate([xyz, feats], -1)
    rgb = rng.randn(3, h, w).astype(np.float32) * 0.3
    choose = rng.choice(h * w, size=n, replace=False).astype(np.int32)

    want_kp, want_seg, want_ctr = _t_pvn3d_forward(sd, cfg, pcld, rgb,
                                                   choose)

    model = PVN3D(cfg=cfg, train=False, sparse_cnn=False)
    rgb_j = jnp.asarray(np.transpose(rgb, (1, 2, 0))[None])
    pc_j = jnp.asarray(pcld[None])
    ch_j = jnp.asarray(choose[None])
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), pc_j, rgb_j, ch_j))
    variables = load_pvn3d_into(shapes, sd)
    out = model.apply(variables, pc_j, rgb_j, ch_j)

    def close(name, got, want, atol):
        got = np.asarray(got)
        err = np.abs(got - want).max()
        assert err < atol, f"{name}: max abs err {err} (atol {atol})"

    close("seg_logits", out["seg_logits"], want_seg, 2e-3)
    close("kp_offsets", out["kp_offsets"], want_kp, 2e-3)
    close("ctr_offsets", out["ctr_offsets"], want_ctr, 2e-3)
    # Predicted classes must agree everywhere (the quantity eval consumes).
    assert (np.argmax(np.asarray(out["seg_logits"]), -1)
            == np.argmax(want_seg, -1)).mean() > 0.999

    # The sparse CNN tail (the production eval path) with the SAME
    # converted weights must agree with the dense-gather reference path.
    sparse = PVN3D(cfg=cfg, train=False, sparse_cnn=True)
    out_s = sparse.apply(variables, pc_j, rgb_j, ch_j)
    close("seg_logits_sparse", out_s["seg_logits"], want_seg, 2e-3)
    close("kp_offsets_sparse", out_s["kp_offsets"], want_kp, 2e-3)
