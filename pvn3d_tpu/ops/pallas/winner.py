"""Fused MeanShift winner-statistics kernel.

The winner pass of the batched MeanShift (inference/meanshift.py) needs,
per clustering hypothesis, the in-bandwidth neighbor count of every seed
at its ORIGINAL position, the argmax seed, and that seed's membership row
(reference semantics: meanshift_pytorch.py:45-51).  The XLA formulation
materializes chunked (chunk, K, K) distance/membership tensors through
HBM — ~16 MB per chunk, memory-bound (0.61 ms for the 168-hypothesis
keypoint pass on v5-lite).  Here each hypothesis's (K, K) tile lives
entirely in VMEM (512x512 f32 = 1 MB): one MXU dot for the cross terms,
VPU threshold+count, row extraction of the winner — nothing but the
(H, K) inputs and outputs ever touches HBM.

Distances use the expanded |a|^2 - 2ab + |b|^2 form in full f32 (the MXU
default would truncate to bf16 and perturb d^2 at the bandwidth^2 scale —
see CLAUDE.md); equal to the XLA path up to f32 rounding of the same
expression, so membership can differ only for points within ~1e-6 of the
bandwidth boundary.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _winner_kernel(bw2: float, pts_ref, msk_ref, mskc_ref,
                   lab_ref, win_ref, cnt_ref):
    a = pts_ref[0]                                    # (K, 3)
    m = msk_ref[0]                                    # (1, K)
    mc = mskc_ref[0]                                  # (K, 1) same mask
    asq = jnp.sum(a * a, axis=1, keepdims=True)       # (K, 1)
    cross = jax.lax.dot_general(
        a, a, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (K, K)
    # Same association order as meanshift._pairwise_sqdist ((a-2c)+b) so
    # boundary membership is bit-identical to the XLA oracle.  The row
    # mask arrives pre-transposed as a second input (Mosaic cannot
    # transpose i1 vectors in-kernel).
    d2 = jnp.maximum(asq - 2.0 * cross + jnp.transpose(asq), 0.0)
    in_bw = (d2 < bw2) & (m > 0.5) & (mc > 0.5)         # (K, K)
    num_in = jnp.sum(in_bw.astype(jnp.int32), axis=1)   # (K,)
    # Mosaic argmax lowers for f32 only; counts <= K < 2^24 are exact.
    win = jnp.argmax(num_in.astype(jnp.float32)).astype(jnp.int32)
    # Row extraction without dynamic_slice (unsupported in Mosaic): mask
    # the winner row with an iota compare and max-reduce over rows.  The
    # winner's count is max(num_in) by definition of argmax.
    rows = jax.lax.broadcasted_iota(jnp.int32, in_bw.shape, 0)
    lab_ref[0, 0] = jnp.max(
        jnp.where(rows == win, in_bw.astype(jnp.int32), 0), axis=0)
    win_ref[0, 0, 0] = win
    cnt_ref[0, 0, 0] = jnp.max(num_in)


@functools.partial(jax.jit, static_argnames=("bandwidth", "interpret"))
def winner_stats_fused(points: jnp.ndarray, mask: jnp.ndarray,
                       bandwidth: float, interpret: bool = False):
    """(H, K, 3) points + (H, K) validity -> (win, labels, counts).

    Same contract as the XLA ``_winner_stats``: ``win`` (H,) int32 argmax
    seed, ``labels`` (H, K) bool membership of the winner's original
    position, ``counts`` (H,) int32 in-bandwidth count of the winner.
    """
    h, k, _ = points.shape
    k_pad = -(-k // _LANES) * _LANES
    pts = points.astype(jnp.float32)
    msk = mask.astype(jnp.float32)[:, None, :]            # (H, 1, K)
    if k_pad != k:
        pts = jnp.pad(pts, ((0, 0), (0, k_pad - k), (0, 0)))
        msk = jnp.pad(msk, ((0, 0), (0, 0), (0, k_pad - k)))
    mskc = jnp.swapaxes(msk, 1, 2)                        # (H, K, 1)

    kernel = functools.partial(_winner_kernel,
                               float(bandwidth) * float(bandwidth))
    labels, win, counts = pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, k_pad, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # Scalars go to SMEM (Mosaic cannot store scalars to VMEM).
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, 1, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((h, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((h, 1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(pts, msk, mskc)
    return win[:, 0, 0], labels[:, 0, :k] > 0, counts[:, 0, 0]
