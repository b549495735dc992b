"""Furthest point sampling as a Pallas TPU kernel.

FPS is the one truly sequential op in the PointNet++ trunk: m dependent
steps, each an O(N) min-distance update + argmax.  The reference runs it as
one CUDA block per batch row with a shared-memory argmax tree
(pvn3d/_ext-src/src/sampling_gpu.cu:62-229).

TPU design: the whole batch runs in ONE kernel program with batch rows on
the sublane axis — every step performs row-wise (B, N) vector ops and
row-wise reductions, so the serial m-step chain is paid once for the whole
batch instead of once per row (grid-per-row serializes on the single
TensorCore; batching in-kernel measured ~B× faster for B >= 8).  The
min-distance cache lives in VMEM scratch for the entire loop; the XLA scan
fallback in ``pvn3d_tpu.ops.sampling`` re-materializes carries through HBM.

Per step (all (B, N)-shaped, row-wise):
  onehot   = (col == last_idx)                  per-row selected point
  lx,ly,lz = row-sum(coord * onehot)            coordinate extraction
  mind     = min(mind, ||p - last||^2) masked
  next     = first row-argmax(mind)             max + min-index-of-max

Ties resolve to the lowest index, matching ``jnp.argmax`` in the XLA path
and the reference's tree reduction (sampling_gpu.cu:22-52).

Reference semantic quirks kept (sampling_gpu.cu:92-110): sample 0 is always
index 0; points with squared norm <= 1e-3 never win and never update the
cache.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MAX_ROWS_PER_PROGRAM = 16     # VMEM cap incl. double-buffered blocks + temporaries


def _fps_kernel_wide(n_valid: int, npoint: int, x_ref, out_ref, mind_ref):
    """Small-batch variant with each row's N axis folded onto sublanes AND
    lanes.

    The row-major kernel below runs every per-step op on (B, N) vectors —
    at B < 8 that underfills the sublane axis (12.5% VPU width at B=1).
    Here the host reshapes every row to (8, N/8) (row-major: flat index
    j = s*(N/8)+l) and stacks rows on a leading dim, so each of the m
    serial steps runs full-width per row; reductions keep the trailing
    two axes and stay per-row.  Measured 2.6x on-chip at B=1, N=12288,
    m=2048 (1.55 -> 0.59 ms floor-corrected); at B=2 the batched fold
    keeps the same full-width per-row steps where the row-major kernel
    would idle 75% of the sublanes (round-4 fix for part of the B>1
    throughput regression; B>=3 stays row-major — see the crossover
    note in ``fps_pallas``).  Semantics identical to the row kernel (same
    flat index order, same tie rule, same skip quirks) — property-tested
    against the numpy oracle and the XLA path.

    x_ref: (3, B, 8, Nw) f32; out_ref: (B, npoint) i32;
    mind_ref: (B, 8, Nw).
    """
    b = x_ref.shape[1]
    nw = x_ref.shape[-1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, nw), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, nw), 1)
    jcol = sub * nw + lane                         # flat point index
    neg_inf = jnp.float32(-jnp.inf)
    big_i = jnp.int32(8 * nw)
    ocol = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)
    out_ref[...] = jnp.zeros((b, npoint), jnp.int32)

    # Rows are unrolled in-kernel (b is small, < 8): every per-row op is a
    # full-width 2-D (8, Nw) vector op — Mosaic's well-supported layout —
    # while the m-step serial chain is shared by the whole batch.
    rows = []
    for bi in range(b):
        x = x_ref[0, bi]
        y = x_ref[1, bi]
        z = x_ref[2, bi]
        mag = x * x + y * y + z * z
        skip = (mag <= 1e-3) | (jcol >= n_valid)
        rows.append((x, y, z, skip))
        mind_ref[bi] = jnp.full((8, nw), 1e10, jnp.float32)

    def body(i, last):
        nxts = []
        for bi in range(b):
            x, y, z, skip = rows[bi]
            onehot = (jcol == last[bi]).astype(jnp.float32)
            lx = jnp.sum(x * onehot, axis=(0, 1), keepdims=True)
            ly = jnp.sum(y * onehot, axis=(0, 1), keepdims=True)
            lz = jnp.sum(z * onehot, axis=(0, 1), keepdims=True)
            d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
            mind = jnp.where(skip, mind_ref[bi],
                             jnp.minimum(mind_ref[bi], d))
            mind_ref[bi] = mind
            cand = jnp.where(skip, neg_inf, mind)
            best = jnp.max(cand, axis=(0, 1), keepdims=True)
            nxt = jnp.min(jnp.where(cand == best, jcol, big_i),
                          axis=(0, 1), keepdims=True).astype(jnp.int32)
            nxt = jnp.where(nxt >= big_i, 0, nxt)
            out_ref[bi:bi + 1, :] = jnp.where(
                ocol == i, nxt, out_ref[bi:bi + 1, :])
            nxts.append(nxt)
        return tuple(nxts)

    jax.lax.fori_loop(1, npoint, body,
                      tuple(jnp.zeros((1, 1), jnp.int32) for _ in range(b)))


def _fps_kernel(n_valid: int, npoint: int, x_ref, out_ref, mind_ref):
    """One batch tile.  x_ref: (3, Bt, Np) f32; out_ref: (Bt, npoint) i32;
    mind_ref: (Bt, Np) f32 VMEM scratch."""
    bt = x_ref.shape[1]
    npl = x_ref.shape[-1]
    x = x_ref[0]
    y = x_ref[1]
    z = x_ref[2]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (bt, npl), 1)
    mag = x * x + y * y + z * z
    skip = (mag <= 1e-3) | (jcol >= n_valid)
    neg_inf = jnp.float32(-jnp.inf)
    mind_ref[:, :] = jnp.full((bt, npl), 1e10, jnp.float32)
    ocol = jax.lax.broadcasted_iota(jnp.int32, (bt, npoint), 1)
    out_ref[:, :] = jnp.zeros((bt, npoint), jnp.int32)

    def body(i, last):
        onehot = (jcol == last).astype(jnp.float32)
        lx = jnp.sum(x * onehot, axis=1, keepdims=True)
        ly = jnp.sum(y * onehot, axis=1, keepdims=True)
        lz = jnp.sum(z * onehot, axis=1, keepdims=True)
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        mind = jnp.where(skip, mind_ref[:, :],
                         jnp.minimum(mind_ref[:, :], d))
        mind_ref[:, :] = mind
        cand = jnp.where(skip, neg_inf, mind)
        best = jnp.max(cand, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(cand == best, jcol, npl), axis=1,
                      keepdims=True).astype(jnp.int32)
        # Guard degenerate all-skip rows (reference leaves idx 0).
        nxt = jnp.where(nxt >= npl, 0, nxt)
        out_ref[:, :] = jnp.where(ocol == i, nxt, out_ref[:, :])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((bt, 1), jnp.int32))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int,
               interpret: bool = False) -> jnp.ndarray:
    """Iterative FPS: (B, N, 3) -> (B, npoint) int32 indices."""
    b, n, _ = xyz.shape
    if npoint == 1:
        return jnp.zeros((b, 1), jnp.int32)

    if b <= 2:
        # Wide layout: fold each row's N onto sublanes x lanes (see
        # _fps_kernel_wide).  Row-major (N,) -> (8, N/8) keeps the flat
        # index order, so semantics are unchanged.  Measured crossover
        # (v5-lite, N=12288, m=2048): wide wins at B=1 (1.51 vs 2.04 ms)
        # and B=2 (2.28 vs 2.57) but loses at B=4 (3.79 vs 2.75) — the
        # per-row unrolled reductions overtake the row-major kernel's
        # shared-instruction reductions once enough sublanes are filled.
        n_pad = -(-n // (8 * _LANES)) * (8 * _LANES)
        xt = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # (3,B,N)
        if n_pad != n:
            xt = jnp.pad(xt, ((0, 0), (0, 0), (0, n_pad - n)))
        xt = xt.reshape(3, b, 8, n_pad // 8)
        out = pl.pallas_call(
            functools.partial(_fps_kernel_wide, n, npoint),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
            scratch_shapes=[pltpu.VMEM((b, 8, n_pad // 8), jnp.float32)],
            interpret=interpret,
        )(xt)
        return out

    n_pad = -(-n // _LANES) * _LANES
    xt = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))   # (3, B, N)
    if n_pad != n:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, n_pad - n)))

    if b <= _MAX_ROWS_PER_PROGRAM:
        bt, b_pad, grid = b, b, 1
    else:
        bt = _MAX_ROWS_PER_PROGRAM
        b_pad = -(-b // bt) * bt
        grid = b_pad // bt
        if b_pad != b:
            xt = jnp.pad(xt, ((0, 0), (0, b_pad - b), (0, 0)))

    kernel = functools.partial(_fps_kernel, n, npoint)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((3, bt, n_pad), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, npoint), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bt, n_pad), jnp.float32)],
        interpret=interpret,
    )(xt)
    return out[:b]


# Round-4 optimization notes (measured on v5-lite, N=12288, m=2048, B=1,
# wide layout at 1.04 ms floor-corrected = ~508 ns/step):
#  * Replacing the (1, npoint) where-masked output write with a dynamic
#    sublane store into an (npoint, 128) buffer: 1.033 vs 1.048 ms — the
#    output write is NOT the bottleneck.  (Dynamic LANE stores are
#    rejected by Mosaic: lane offsets must be multiples of 128.)
#  * Fetching the picked point's coordinates via SMEM scalar loads
#    instead of the three masked-sum extractions: infeasible — SMEM
#    allocation pads (N, 3) f32 ~40x past the 1 MB scalar-memory limit.
#  * The step is latency-bound on its ~5 cross-lane reductions (3
#    coordinate extractions + max + min-index), each a multi-op shift
#    tree over (8, 1536); elementwise width is not the constraint.
#    Serial-chain floor stands unless the extraction count drops.
