"""Support-coverage analysis for extending CNN sparsity to the up2 stage.

VERDICT r3 #4 asked whether the second-to-last PSP upsample (240x320,
C=64) could also run sparsely at the pixels the 12288 samples need.
This measures that support set: each sampled full-res pixel pulls a 3x3
patch through up3's sparse evaluation, and each patch tap
bilinear-reads floor/ceil coordinates of the up2 map — the union is the
set of up2 outputs a sparse up2 would have to produce.

Measured (python -m benchmarks.up2_sparse_coverage):
  uniform choose   -> 77% of the 240x320 map
  object-clustered -> 40%

Verdict: NEGATIVE.  The best case saves (1 - 0.4) of up2's ~1 ms dense
cost (~0.6 ms) but adds per-point patch gathers at P=12288 — the same
machinery that makes the LAST stage's sparse path only ~0.2 ms cheaper
than dense at its 4% coverage (cnn_breakdown), and that LOSES to dense
at B>1.  At 10-20x the coverage the gather overhead strictly dominates;
up2 stays dense.  (A sparse up2 would additionally force up3's bilinear
reads through an index map instead of a grid.)
"""
from __future__ import annotations

import numpy as np


def coverage(rows, cols, H=480, W=640, h2=240, w2=320):
    need = np.zeros((h2, w2), bool)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            rr = np.clip(rows + dr, 0, H - 1)
            cc = np.clip(cols + dc, 0, W - 1)
            rf = rr * (h2 - 1) / (H - 1)
            cf = cc * (w2 - 1) / (W - 1)
            for r0 in (np.floor(rf), np.ceil(rf)):
                for c0 in (np.floor(cf), np.ceil(cf)):
                    need[r0.astype(int), c0.astype(int)] = True
    return need.mean()


def main():
    H, W, n = 480, 640, 12288
    rng = np.random.RandomState(0)
    idx = rng.choice(H * W, n, replace=False)
    print("uniform coverage:", round(coverage(idx // W, idx % W), 3))
    rows, cols = [], []
    for _ in range(5):
        r0, c0 = rng.randint(80, 400), rng.randint(80, 560)
        rows.append(np.clip(rng.randn(n // 5) * 40 + r0, 0, H - 1))
        cols.append(np.clip(rng.randn(n // 5) * 50 + c0, 0, W - 1))
    rows = np.concatenate(rows).astype(int)
    cols = np.concatenate(cols).astype(int)
    print("clustered coverage:", round(coverage(rows, cols), 3))


if __name__ == "__main__":
    main()
