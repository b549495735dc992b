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
