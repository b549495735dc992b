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

Distances use the direct (a_i - a_j)^2 form on the VPU, in full f32: the
expanded |a|^2 - 2ab + |b|^2 MXU form was a depth-3 contraction through
the 128-deep systolic array (~2% utilization — measured ~2/3 of kernel
time), and its cancellation also perturbs d^2 near the boundary (the
exact ball query made the same call, ops/grouping.py).  Membership can
differ from the expanded-form XLA fallback only for points within f32
rounding (~1e-6 relative) of the bandwidth boundary; the oracle test
tolerates exactly that window.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _winner_kernel(bw2: float, pts_ref, ptsr_ref, msk_ref, mskc_ref,
                   lab_ref, win_ref, cnt_ref):
    a = pts_ref[0]                                    # (K, 3)
    ar = ptsr_ref[0]                                  # (3, K) pre-transposed
    m = msk_ref[0]                                    # (1, K)
    mc = mskc_ref[0]                                  # (K, 1) same mask
    # Direct (a_i - a_j)^2 distances on the VPU.  The previous form fed a
    # depth-3 contraction to the MXU (|a|^2 - 2ab + |b|^2): a 128-deep
    # systolic pass at 3/128 utilization was ~2/3 of the kernel's time
    # (0.59 ms for the 168-hypothesis keypoint pass).  Three broadcast
    # sub+FMA sweeps over the (K, K) tile are pure VPU work — and the
    # direct form is also the numerically better one (no cancellation;
    # same reasoning as the exact-mode ball query, ops/grouping.py).
    # Boundary membership can differ from the XLA oracle's expanded form
    # by ~1e-6 * d^2 rounding; the oracle comparison tolerates exactly
    # that window (tests/test_pallas.py::_assert_winner_match).
    d2 = jnp.zeros(a.shape[:1] + ar.shape[1:], jnp.float32)
    for c in range(3):
        diff = a[:, c:c + 1] - ar[c:c + 1, :]         # (K, K)
        d2 = d2 + diff * diff
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
    pts_r = jnp.swapaxes(pts, 1, 2)                       # (H, 3, K)

    kernel = functools.partial(_winner_kernel,
                               float(bandwidth) * float(bandwidth))
    labels, win, counts = pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, k_pad, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, k_pad), lambda i: (i, 0, 0),
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
    )(pts, pts_r, msk, mskc)
    return win[:, 0, 0], labels[:, 0, :k] > 0, counts[:, 0, 0]
