"""On-device (jnp) twins of the training-time RGB/scene augmentations.

Host originals: data/augment.py (ports of the reference's augmentation
stack, ycb_dataset.py:109-177, linemod_dataset.py:129-150).  These twins
let the TRAIN path run augmentation inside the jitted step — the host
only decodes images — closing the feed-the-chip gap the loader bench
measures (the reference needs 60 CPU workers for the same reason).

Fidelity criterion (same as normals, data/normals.py:5-8): augmentations
are random noise — the contract is distribution-level, not bit-level.
Deliberate realization differences from the cv2 host path, each noted
inline: float HSV round-trip instead of uint8-quantized cv2 HSV;
analytic anti-aliased line kernel instead of cv2.line rasterization for
motion blur; every branchy "maybe apply" computes both sides and selects
(XLA-friendly — the ops are cheap next to the model).

All functions take uint8-range float images (0-255, dataset-native
channel order) and explicit PRNG keys, mirroring the host functions'
(rng, img) signatures.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _uniform(key, lo, hi):
    return jax.random.uniform(key, (), jnp.float32, lo, hi)


# ---------------------------------------------------------------------------
# HSV round-trip (float; cv2 conventions: H in [0, 360) degrees here)
# ---------------------------------------------------------------------------

def rgb_to_hsv(img):
    """(..., 3) 0-255 float RGB -> (H deg [0,360), S [0,1], V [0,255])."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c))
    h = jnp.where(c > 0, (h * 60.0) % 360.0, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return h, s, v


def hsv_to_rgb(h, s, v):
    """Inverse of rgb_to_hsv; returns (..., 3) 0-255 float RGB."""
    hp = (h % 360.0) / 60.0
    c = v * s
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = v - c
    i = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [c, x, jnp.zeros_like(c), jnp.zeros_like(c), x, c])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [x, c, c, x, jnp.zeros_like(c), jnp.zeros_like(c)])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [jnp.zeros_like(c), jnp.zeros_like(c), x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def hsv_gain_jnp(key, img, s_range, v_range):
    """S/V channel gain through a (deliberately) BGR-interpreted HSV
    round-trip — the reference converts with COLOR_BGR2HSV regardless of
    actual channel order (ycb_dataset.py:112; host twin augment.py)."""
    ks, kv = jax.random.split(key)
    h, s, v = rgb_to_hsv(img[..., ::-1])
    s = jnp.clip(s * _uniform(ks, *s_range), 0.0, 1.0)
    v = jnp.clip(v * _uniform(kv, *v_range), 0.0, 255.0)
    return hsv_to_rgb(h, s, v)[..., ::-1]


# ---------------------------------------------------------------------------
# ColorJitter (torchvision semantics; host twin augment.py::color_jitter)
# ---------------------------------------------------------------------------

def color_jitter_jnp(key, img, brightness=0.2, contrast=0.2,
                     saturation=0.2, hue=0.05):
    """Random-order brightness/contrast/saturation/hue, factors uniform in
    [1-x, 1+x] (hue in [-hue, hue] turns)."""
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    fb = _uniform(k_b, 1 - brightness, 1 + brightness)
    fc = _uniform(k_c, 1 - contrast, 1 + contrast)
    fs = _uniform(k_s, 1 - saturation, 1 + saturation)
    fh = _uniform(k_h, -hue, hue)

    def op_brightness(x):
        return x * fb

    def op_contrast(x):
        gray = jnp.mean(jnp.clip(x, 0, 255) @ _LUMA)
        return (x - gray) * fc + gray

    def op_saturation(x):
        gray = jnp.clip(x, 0, 255) @ _LUMA
        return (x - gray[..., None]) * fs + gray[..., None]

    def op_hue(x):
        h, s, v = rgb_to_hsv(jnp.clip(x, 0, 255))
        # Host/cv2 path shifts the uint8 H channel by int(h*180) of 180
        # steps == fh*360 degrees.
        return hsv_to_rgb((h + fh * 360.0) % 360.0, s, v)

    perm = jax.random.permutation(k_perm, 4)
    ops = [op_brightness, op_contrast, op_saturation, op_hue]
    x = img.astype(jnp.float32)
    for slot in range(4):
        x = jax.lax.switch(perm[slot], ops, x)
    return jnp.clip(x, 0, 255)


# ---------------------------------------------------------------------------
# Blur / sharpen / noise stack (host twin augment.py::rgb_add_noise_*)
# ---------------------------------------------------------------------------

def _conv2d_same(img, kern):
    """(H, W, 3) image, (k, k) kernel -> depthwise 'same' convolution with
    edge replication (cv2.filter2D BORDER_REFLECT_101 is near-identical
    for smooth kernels; replicate keeps the code trivial)."""
    k = kern.shape[0]
    pad = k // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    x = jnp.transpose(x, (2, 0, 1))[:, None]          # (3, 1, H+2p, W+2p)
    # lax conv is cross-correlation, same as cv2.filter2D — no flip.
    w = kern[None, None].astype(img.dtype)
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "VALID")
    return jnp.transpose(y[:, 0], (1, 2, 0))


def sharpen_jnp(key, img):
    """3x3 all -1 kernel with a random 9..12 center, normalized
    (ycb_dataset.py:118-124)."""
    center = _uniform(key, 0.0, 1.0) * 3.0 + 9.0
    kern = jnp.full((3, 3), -1.0, jnp.float32)
    kern = kern.at[1, 1].set(center)
    return _conv2d_same(img, kern / (center - 8.0))


def motion_blur_jnp(key, img, max_len: int = 15, support: int = 31):
    """Line-kernel blur with random angle/length (linear_motion_blur,
    ycb_dataset.py:90-107).  The line is drawn analytically: kernel
    weight 1 where the pixel center lies within half a pixel of the
    segment from the support center toward (cos a, sin a) * length."""
    ka, kl = jax.random.split(key)
    ang = jnp.floor(_uniform(ka, 0.0, 1.0) * 360.0) * jnp.pi / 180.0
    length = jnp.floor(_uniform(kl, 0.0, 1.0) * max_len) + 1.0
    dx, dy = jnp.cos(ang), jnp.sin(ang)
    c = support // 2
    ys, xs = jnp.mgrid[0:support, 0:support]
    px = xs.astype(jnp.float32) - c
    py = ys.astype(jnp.float32) - c
    # Distance from pixel center to the segment [0, L*(dx,dy)].
    t = jnp.clip(px * dx + py * dy, 0.0, length)
    dist = jnp.sqrt((px - t * dx) ** 2 + (py - t * dy) ** 2)
    kern = (dist <= 0.5).astype(jnp.float32)
    kern = kern / jnp.maximum(kern.sum(), 1.0)
    return _conv2d_same(img, kern)


def gaussian_blur_jnp(key, img):
    """cv2.GaussianBlur with random ksize 3 (80%) / 5 and sigma U(0,1);
    sigma <= 0 never occurs (cv2 would derive it from ksize)."""
    kk, ks = jax.random.split(key)
    use5 = jax.random.uniform(kk) <= 0.2
    sigma = jnp.maximum(jax.random.uniform(ks), 1e-3)
    xs = jnp.arange(5, dtype=jnp.float32) - 2.0
    g = jnp.exp(-(xs * xs) / (2.0 * sigma * sigma))
    # ksize 3: zero the outer taps.
    g = jnp.where((jnp.abs(xs) <= 1) | use5, g, 0.0)
    g = g / g.sum()
    kern = g[:, None] * g[None, :]
    return _conv2d_same(img, kern)


def gaussian_noise_jnp(key, img, sigma):
    return jnp.clip(img + jax.random.normal(key, img.shape) * sigma, 0, 255)


def rgb_add_noise_ycb_jnp(key, img):
    """YCB synthetic-image noise stack (ycb_dataset.py:109-145):
    HSV gain, then maybe-sharpen / maybe-motion-blur / maybe-gaussian-blur
    (p=0.2 each), gaussian noise, maybe extra sigma-7 noise (p=0.2)."""
    keys = jax.random.split(key, 10)
    img = hsv_gain_jnp(keys[0], img, (1.25, 1.45), (1.15, 1.35))
    # The host stack passes uint8 between ops — clamp (without the
    # integer rounding) so overshoot doesn't leak into the next op.
    img = jnp.clip(jnp.where(jax.random.uniform(keys[1]) > 0.8,
                             sharpen_jnp(keys[2], img), img), 0, 255)
    img = jnp.clip(jnp.where(jax.random.uniform(keys[3]) > 0.8,
                             motion_blur_jnp(keys[4], img), img), 0, 255)
    img = jnp.clip(jnp.where(jax.random.uniform(keys[5]) > 0.8,
                             gaussian_blur_jnp(keys[6], img), img), 0, 255)
    sigma = jnp.where(jax.random.uniform(keys[7]) > 0.2,
                      jax.random.randint(keys[8], (), 0, 15),
                      jax.random.randint(keys[8], (), 0, 25))
    img = gaussian_noise_jnp(keys[9], img, sigma.astype(jnp.float32))
    extra = jax.random.uniform(jax.random.fold_in(key, 77)) > 0.8
    noise = jax.random.normal(jax.random.fold_in(key, 78), img.shape) * 7.0
    return jnp.clip(jnp.where(extra, img + noise, img), 0, 255)


def rgb_add_noise_lm_jnp(key, img):
    """LineMOD variant (linemod_dataset.py:129-150): symmetric HSV gains,
    maybe motion / gaussian blur only."""
    keys = jax.random.split(key, 5)
    img = hsv_gain_jnp(keys[0], img, (0.75, 1.25), (0.85, 1.15))
    img = jnp.where(jax.random.uniform(keys[1]) > 0.8,
                    motion_blur_jnp(keys[2], img), img)
    img = jnp.where(jax.random.uniform(keys[3]) > 0.8,
                    gaussian_blur_jnp(keys[4], img), img)
    return jnp.clip(img, 0, 255)


def add_real_back_jnp(rgb, labels, depth, back_rgb, back_depth, back_label):
    """Paste a synthetic render over a real background frame
    (add_real_back, ycb_dataset.py:159-177): background pixels of the
    render take the real frame's background; missing depth likewise."""
    bk_free = (back_label <= 0).astype(jnp.float32)
    fg = (labels > 0).astype(jnp.float32)[..., None]
    rgb_out = rgb * fg + back_rgb[..., :3] * bk_free[..., None] * (1 - fg)
    dm = (depth > 1e-6).astype(jnp.float32)
    depth_out = depth * dm + back_depth * bk_free * (1 - dm)
    return rgb_out, depth_out
