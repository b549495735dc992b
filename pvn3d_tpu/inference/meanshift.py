"""Batched masked MeanShift clustering.

The reference clusters votes sequentially — one `MeanShiftTorch.fit` per
class and per keypoint inside Python loops and a thread pool
(pvn3d/lib/utils/pvn3d_eval_utils.py:83-97, meanshift_pytorch.py:24-51).
Here every (class, keypoint-or-center) hypothesis is one row of a padded
(H, K, 3) problem batch.

Exact reference semantics (meanshift_pytorch.py:24-51):
  * every point is a seed; iterate C_i <- sum_j w_ij A_j / sum_j w_ij with
    w_ij = N(||C_i - A_j||; bw) until max ||ΔC|| < bw*1e-3 or max_iter;
  * the winning seed maximizes the count of points within ``bandwidth`` of
    its ORIGINAL position (the reference computes `num_in` on A, not C —
    meanshift_pytorch.py:45-48);
  * returned center = converged mode of the winning seed; returned labels =
    points within ``bandwidth`` of the winning seed's original position.

Key structural observation: the winner is decided by ORIGINAL-position
density — independent of the iteration — and only the winner's converged
mode is ever returned.  So the default path ("winner") computes the
density/labels with one (K, K) pass and then iterates ONLY the winning
seed: O(K) per iteration instead of O(K^2), turning the reference's
O(iters * K^2) per hypothesis into O(K^2 + iters * K).  The all-seeds
fixed point ("dense" mode) is kept for oracle comparison; both satisfy the
same per-seed stopping rule, so the returned mode differs only by
sub-stop-threshold amounts (< bandwidth * 1e-3).

Masking: ``mask`` marks valid (non-pad) points per hypothesis.  Invalid
points get zero kernel weight and can never win the seed vote.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SQRT_2PI = 2.5066282746310002


def _pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., I, 3), (..., J, 3) -> (..., I, J) squared distances."""
    a_sq = jnp.sum(a * a, axis=-1)
    b_sq = jnp.sum(b * b, axis=-1)
    # HIGHEST precision is load-bearing: the MXU default truncates f32 to
    # bf16, perturbing d^2 by the same order as bandwidth^2 = 2.5e-3 —
    # enough to move in-bandwidth membership and cluster winners on-chip
    # (see ops/grouping.py).  K=3 keeps full precision free.
    cross = jnp.einsum("...ic,...jc->...ij", a, b,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a_sq[..., :, None] - 2.0 * cross + b_sq[..., None, :],
                       0.0)


def _winner_stats(points, mask, bandwidth, chunk, impl="auto"):
    """One chunked (K, K) pass over ORIGINAL positions: winning seed index,
    cluster labels and counts (meanshift_pytorch.py:45-51 semantics).

    impl: "auto" (fused pallas kernel on TPU — each hypothesis's (K, K)
    distance/membership tile stays in VMEM instead of ~16 MB/chunk HBM
    round-trips), "pallas", or "xla" (the chunked lax.map form below,
    also the oracle for the kernel's test).
    """
    if impl == "auto":
        # The fused kernel holds the whole (K, K) f32 tile (+ membership
        # and d2 temporaries) in VMEM: K=2048 needs 34 MB against the
        # 16 MB scoped-vmem limit (measured compile OOM, cluster_cap
        # 2048 A/B).  K <= 1024 fits with headroom; larger caps take the
        # chunked XLA path.
        k_fits_vmem = points.shape[1] <= 1024
        impl = ("pallas" if jax.default_backend() == "tpu" and k_fits_vmem
                else "xla")
    if impl == "pallas":
        from pvn3d_tpu.ops.pallas.winner import winner_stats_fused
        return winner_stats_fused(points, mask, float(bandwidth),
                                  interpret=jax.default_backend() != "tpu")
    h, k, _ = points.shape
    bw2 = jnp.float32(bandwidth * bandwidth)
    n_chunks = -(-h // chunk)
    pad = n_chunks * chunk - h
    pts = jnp.pad(points, ((0, pad), (0, 0), (0, 0)))
    msk = jnp.pad(mask, ((0, pad), (0, 0)))

    def per_chunk(args):
        a, m = args
        d2 = _pairwise_sqdist(a, a)
        in_bw = (d2 < bw2) & m[:, None, :] & m[:, :, None]
        num_in = jnp.sum(in_bw, axis=-1).astype(jnp.int32)
        win = jnp.argmax(num_in, axis=-1)
        labels = jnp.take_along_axis(in_bw, win[:, None, None],
                                     axis=1)[:, 0, :]
        counts = jnp.take_along_axis(num_in, win[:, None], axis=1)[:, 0]
        return win.astype(jnp.int32), labels, counts

    win, labels, counts = jax.lax.map(
        per_chunk, (pts.reshape(n_chunks, chunk, k, 3),
                    msk.reshape(n_chunks, chunk, k)))
    return (win.reshape(-1)[:h], labels.reshape(-1, k)[:h],
            counts.reshape(-1)[:h])


@functools.partial(jax.jit, static_argnames=("bandwidth", "max_iter",
                                              "chunk", "mode", "unroll"))
def mean_shift_fit(points: jnp.ndarray, mask: jnp.ndarray,
                   bandwidth: float, max_iter: int = 300,
                   chunk: int = 16, mode: str = "winner",
                   unroll: int = 4):
    """Run masked MeanShift on a batch of padded point sets.

    Args:
      points: (H, K, 3) float32 — H independent clustering problems.
      mask: (H, K) bool validity.
      bandwidth: kernel bandwidth (reference radius=0.08 for votes).
      max_iter: iteration cap (reference: 300).
      chunk: hypotheses per (K, K) distance tile.
      mode: "winner" (default; iterate only the winning seed) or "dense"
        (all seeds, the literal reference fixed point).
      unroll: shift steps per while-loop iteration (winner mode).  Each
        step is tiny (H*K work) so the loop is latency-bound on TPU;
        grouping ``unroll`` steps amortizes the per-iteration overhead.
        Convergence is checked after each group, so up to unroll-1 extra
        steps run past the reference's per-step stopping rule — each such
        step moves an already-converged center by < stop = bandwidth*1e-3
        (0.05 mm at the vote bandwidth), the same sub-threshold slack as
        the documented dense/winner equivalence.

    Returns:
      centers (H, 3): winning mode per problem;
      labels (H, K) bool: in-bandwidth membership of the winning cluster;
      counts (H,) int32: winning cluster size.
    """
    points = points.astype(jnp.float32)
    mask = mask.astype(bool)
    if mode == "dense":
        return _fit_dense(points, mask, bandwidth, max_iter, chunk)

    win, labels, counts = _winner_stats(points, mask, bandwidth, chunk)
    bw = jnp.float32(bandwidth)
    stop = bw * 1e-3
    wmask = mask.astype(jnp.float32)                      # (H, K)
    seed = jnp.take_along_axis(points, win[:, None, None], axis=1)[:, 0, :]

    def shift_once(c):
        # c: (H, 3) -> next mean under the Gaussian kernel over points.
        d2 = jnp.sum((points - c[:, None, :]) ** 2, axis=-1)   # (H, K)
        w = jnp.exp(-0.5 * d2 / (bw * bw)) * wmask
        wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-20)
        return jnp.einsum("hk,hkc->hc", w, points,
                          precision=jax.lax.Precision.HIGHEST) / wsum

    def cond(carry):
        _, it, max_shift = carry
        return (max_shift >= stop) & (it < max_iter)

    def body(carry):
        c, it, _ = carry
        shift = None
        for _ in range(unroll):
            new_c = shift_once(c)
            shift = jnp.linalg.norm(new_c - c, axis=-1)
            c = new_c
        return c, it + unroll, jnp.max(shift)

    c0, it0, s0 = body((seed, jnp.int32(0), jnp.float32(jnp.inf)))
    centers, _, _ = jax.lax.while_loop(cond, body, (c0, it0, s0))
    return centers, labels, counts


def _fit_dense(points, mask, bandwidth, max_iter, chunk):
    h, k, _ = points.shape
    n_chunks = -(-h // chunk)
    pad = n_chunks * chunk - h
    pts = jnp.pad(points, ((0, pad), (0, 0), (0, 0)))
    msk = jnp.pad(mask, ((0, pad), (0, 0)))
    fn = functools.partial(_fit_chunk_dense, bandwidth=bandwidth,
                           max_iter=max_iter)
    centers, labels, counts = jax.lax.map(
        fn, (pts.reshape(n_chunks, chunk, k, 3),
             msk.reshape(n_chunks, chunk, k)))
    return (centers.reshape(-1, 3)[:h], labels.reshape(-1, k)[:h],
            counts.reshape(-1)[:h])


def _fit_chunk_dense(args, *, bandwidth: float, max_iter: int):
    a, mask = args                           # (c, K, 3), (c, K)
    bw = jnp.float32(bandwidth)
    stop = bw * 1e-3
    inv_norm = 1.0 / (bw * _SQRT_2PI)
    wmask = mask.astype(jnp.float32)[:, None, :]     # (c, 1, K)

    def shift_once(c_pts):
        d2 = _pairwise_sqdist(c_pts, a)               # (c, K, K)
        w = inv_norm * jnp.exp(-0.5 * d2 / (bw * bw)) * wmask
        wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-20)
        return jnp.einsum("cij,cjd->cid", w, a,
                          precision=jax.lax.Precision.HIGHEST) / wsum

    def cond(carry):
        _, it, max_shift = carry
        return (max_shift >= stop) & (it < max_iter)

    def body(carry):
        c_pts, it, _ = carry
        new_c = shift_once(c_pts)
        shift = jnp.linalg.norm(new_c - c_pts, axis=-1)
        shift = jnp.where(mask, shift, 0.0)
        return new_c, it + 1, jnp.max(shift)

    c0, it0, s0 = body((a, jnp.int32(0), jnp.float32(jnp.inf)))
    c_final, _, _ = jax.lax.while_loop(cond, body, (c0, it0, s0))

    d2_orig = _pairwise_sqdist(a, a)
    in_bw = (d2_orig < bw * bw) & mask[:, None, :] & mask[:, :, None]
    num_in = jnp.sum(in_bw, axis=-1).astype(jnp.int32)   # (c, K)
    win = jnp.argmax(num_in, axis=-1)                    # (c,)
    centers = jnp.take_along_axis(
        c_final, win[:, None, None], axis=1)[:, 0, :]
    labels = jnp.take_along_axis(in_bw, win[:, None, None], axis=1)[:, 0, :]
    counts = jnp.take_along_axis(num_in, win[:, None], axis=1)[:, 0]
    return centers, labels, counts
