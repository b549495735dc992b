"""RGB / scene augmentations (host-side numpy + cv2).

Ports the reference's training-time augmentation behavior:
  * torchvision-style ColorJitter(0.2, 0.2, 0.2, 0.05) applied to every
    training image (ycb_dataset.py:29,193);
  * the synthetic-image noise stack ``rgb_add_noise`` — HSV gain, sharpen,
    linear motion blur, gaussian blur, gaussian noise
    (ycb_dataset.py:109-145; the LineMOD variant drops sharpen/noise and
    uses symmetric HSV gains, linemod_dataset.py:129-150);
  * pasting a synthetic render over a real background image + real depth
    (``add_real_back``, ycb_dataset.py:159-177).

All functions take/return uint8 (or float) HWC images and an explicit
np.random.RandomState so workers are reproducible.
"""
from __future__ import annotations

import cv2
import numpy as np


def _rand_range(rng, lo, hi):
    return rng.rand() * (hi - lo) + lo


def color_jitter(rng: np.random.RandomState, img: np.ndarray,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2, hue: float = 0.05) -> np.ndarray:
    """torchvision ColorJitter semantics: random order of the four ops,
    factors uniform in [max(0, 1-x), 1+x] (hue in [-hue, hue])."""
    # Luma weights of cv2.COLOR_RGB2GRAY; computing the gray directly on
    # the clipped float image skips two uint8/cvtColor round-trips per op
    # (same ITU-R 601 definition, sub-quantization differences only).
    luma = np.array([0.299, 0.587, 0.114], np.float32)
    img = img.astype(np.float32)
    ops = list(range(4))
    rng.shuffle(ops)
    for op in ops:
        if op == 0 and brightness:
            img = img * _rand_range(rng, 1 - brightness, 1 + brightness)
        elif op == 1 and contrast:
            f = _rand_range(rng, 1 - contrast, 1 + contrast)
            gray = np.clip(img, 0, 255).mean(axis=(0, 1)) @ luma
            img = (img - gray) * f + gray
        elif op == 2 and saturation:
            f = _rand_range(rng, 1 - saturation, 1 + saturation)
            gray = np.clip(img, 0, 255) @ luma
            img = (img - gray[..., None]) * f + gray[..., None]
        elif op == 3 and hue:
            h = _rand_range(rng, -hue, hue)
            hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                               cv2.COLOR_RGB2HSV).astype(np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(h * 180)) % 180
            img = cv2.cvtColor(hsv.astype(np.uint8),
                               cv2.COLOR_HSV2RGB).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


def linear_motion_blur(img: np.ndarray, angle_deg: float,
                       length: int) -> np.ndarray:
    """Line-kernel blur (reference: linear_motion_blur,
    ycb_dataset.py:90-107)."""
    rad = np.deg2rad(angle_deg)
    dx, dy = np.cos(rad), np.sin(rad)
    a = int(max(abs(dx), abs(dy)) * length * 2)
    if a <= 0:
        return img
    kern = np.zeros((a, a), np.float32)
    cx = cy = a // 2
    ex, ey = int(dx * length + cx), int(dy * length + cy)
    cv2.line(kern, (cx, cy), (ex, ey), 1.0)
    s = kern.sum()
    if s == 0:
        kern[cy, cx] = 1.0
    else:
        kern /= s
    return cv2.filter2D(img, -1, kern)


def _standard_normal_f32(rng: np.random.RandomState, shape) -> np.ndarray:
    """N(0,1) samples in float32 via a Generator seeded from ``rng``.

    RandomState.randn only emits float64 (2-3x the cost at image size);
    the bit-stream differs but the distribution and the determinism
    contract (same rng state -> same output) are preserved."""
    gen = np.random.Generator(np.random.PCG64(rng.randint(1 << 31)))
    return gen.standard_normal(shape, dtype=np.float32)


def gaussian_noise(rng, img: np.ndarray, sigma: float) -> np.ndarray:
    out = img.astype(np.float32) + _standard_normal_f32(rng, img.shape) * sigma
    return np.clip(out, 0, 255).astype(np.uint8)


def _hsv_gain(rng, img, s_range, v_range):
    # The reference converts with COLOR_BGR2HSV regardless of the array's
    # actual channel order (ycb_dataset.py:112); kept for parity.
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.uint16)
    hsv[..., 1] = np.clip(hsv[..., 1] * _rand_range(rng, *s_range), 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] * _rand_range(rng, *v_range), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def rgb_add_noise_ycb(rng: np.random.RandomState,
                      img: np.ndarray) -> np.ndarray:
    """YCB synthetic-image noise stack (ycb_dataset.py:109-145)."""
    img = _hsv_gain(rng, img, (1.25, 1.45), (1.15, 1.35))

    if rng.rand() > 0.8:                                  # sharpen
        kernel = -np.ones((3, 3), np.float32)
        kernel[1, 1] = rng.rand() * 3 + 9
        kernel /= kernel.sum()
        img = cv2.filter2D(img, -1, kernel)

    if rng.rand() > 0.8:                                  # motion blur
        img = linear_motion_blur(img, int(rng.rand() * 360),
                                 int(rng.rand() * 15) + 1)

    if rng.rand() > 0.8:                                  # gaussian blur
        ksz = 3 if rng.rand() > 0.2 else 5
        img = cv2.GaussianBlur(img, (ksz, ksz), rng.rand())

    sigma = rng.randint(15) if rng.rand() > 0.2 else rng.randint(25)
    img = gaussian_noise(rng, img, sigma)

    if rng.rand() > 0.8:
        # (the reference uses the unseeded global np.random here,
        # ycb_dataset.py:143 — drawn from the worker rng instead so
        # frames stay reproducible)
        img = img + _standard_normal_f32(rng, img.shape) * 7.0
    return np.clip(img, 0, 255).astype(np.uint8)


def rgb_add_noise_lm(rng: np.random.RandomState,
                     img: np.ndarray) -> np.ndarray:
    """LineMOD variant (linemod_dataset.py:129-150): symmetric HSV gains,
    motion/gaussian blur only."""
    img = _hsv_gain(rng, img, (0.75, 1.25), (0.85, 1.15))
    if rng.rand() > 0.8:
        img = linear_motion_blur(img, int(rng.rand() * 360),
                                 int(rng.rand() * 15) + 1)
    if rng.rand() > 0.8:
        ksz = 3 if rng.rand() > 0.2 else 5
        img = cv2.GaussianBlur(img, (ksz, ksz), rng.rand())
    return np.clip(img, 0, 255).astype(np.uint8)


def add_real_back(rgb: np.ndarray, labels: np.ndarray, depth: np.ndarray,
                  depth_mask: np.ndarray, back_rgb: np.ndarray,
                  back_depth: np.ndarray,
                  back_label: np.ndarray) -> tuple:
    """Paste a synthetic render onto a real background frame
    (reference: add_real_back, ycb_dataset.py:159-177): background pixels
    (label <= 0) of the render take the real image's background pixels;
    missing depth takes the real background depth."""
    bk_free = (back_label <= 0).astype(rgb.dtype)
    back = back_rgb[..., :3] * bk_free[..., None]
    dpt_back = back_depth.astype(np.float32) * bk_free.astype(np.float32)

    fg = (labels > 0).astype(rgb.dtype)[..., None]
    rgb = rgb * fg + back * (1 - fg)
    dm = (depth_mask > 0).astype(depth.dtype)
    depth = depth * dm + dpt_back * (1 - dm)
    return rgb, depth
