"""Furthest point sampling as a Pallas TPU kernel.

FPS is the one truly sequential op in the PointNet++ trunk: m dependent
steps, each an O(N) min-distance update + argmax.  The reference runs it as
one CUDA block per batch row with a shared-memory argmax tree
(pvn3d/_ext-src/src/sampling_gpu.cu:62-229).

TPU design: one grid program per batch row; the (3, N) coordinates and the
running min-distance cache live in VMEM for the whole m-step loop, so each
step is pure VPU work with zero HBM traffic (the XLA scan fallback in
``pvn3d_tpu.ops.sampling`` re-materializes carries through HBM between
steps when the cache doesn't fit in registers).  Each step:

  d_j   = ||p_j - p_last||^2            (vector, N lanes)
  mind  = min(mind, d_j) masked          (skip ||p||^2 <= 1e-3, pad lanes)
  next  = first argmax(mind)             (max-reduce + min-index-of-max)

The argmax is realized as two full-width reductions (max value, then min
index attaining it) — both lower to plain VPU reduces; ties resolve to the
lowest index, matching ``jnp.argmax`` in the XLA path and the reference's
tree reduction (sampling_gpu.cu:22-52 prefers the lower index on ties).

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


def _fps_kernel(n_valid: int, npoint: int, x_ref, out_ref, mind_ref):
    """One batch row. x_ref: (1, 3, Np) f32; out_ref: (1, 1, npoint) i32;
    mind_ref: (3, Np) f32 VMEM scratch (row 0 = min-dist cache)."""
    np_lanes = x_ref.shape[-1]
    x0 = x_ref[0, 0:1, :]                                  # (1, Np)
    x1 = x_ref[0, 1:2, :]
    x2 = x_ref[0, 2:3, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, np_lanes), 1)
    mag = x0 * x0 + x1 * x1 + x2 * x2
    skip = (mag <= 1e-3) | (col >= n_valid)
    neg_inf = jnp.float32(-jnp.inf)

    mind_ref[0:1, :] = jnp.full((1, np_lanes), 1e10, jnp.float32)
    ocol = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)
    out_ref[0, 0:1, :] = jnp.zeros((1, npoint), jnp.int32)

    def body(i, last):
        onehot = col == last
        lx = jnp.sum(jnp.where(onehot, x0, 0.0))
        ly = jnp.sum(jnp.where(onehot, x1, 0.0))
        lz = jnp.sum(jnp.where(onehot, x2, 0.0))
        d = ((x0 - lx) * (x0 - lx) + (x1 - ly) * (x1 - ly)
             + (x2 - lz) * (x2 - lz))
        mind = jnp.where(skip, mind_ref[0:1, :],
                         jnp.minimum(mind_ref[0:1, :], d))
        mind_ref[0:1, :] = mind
        cand = jnp.where(skip, neg_inf, mind)
        best = jnp.max(cand)
        nxt = jnp.min(jnp.where(cand == best, col, np_lanes)).astype(jnp.int32)
        # Guard the degenerate all-skip row (reference leaves idx 0).
        nxt = jnp.where(nxt >= np_lanes, 0, nxt)
        out_ref[0, 0:1, :] = jnp.where(ocol == i, nxt, out_ref[0, 0:1, :])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int,
               interpret: bool = False) -> jnp.ndarray:
    """Iterative FPS: (B, N, 3) -> (B, npoint) int32 indices."""
    b, n, _ = xyz.shape
    if npoint == 1:
        return jnp.zeros((b, 1), jnp.int32)
    n_pad = -(-n // _LANES) * _LANES
    xt = jnp.moveaxis(xyz.astype(jnp.float32), -1, -2)     # (B, 3, N)
    if n_pad != n:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, n_pad - n)))
    kernel = functools.partial(_fps_kernel, n, npoint)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((3, n_pad), jnp.float32)],
        interpret=interpret,
    )(xt)
    return out[:, 0, :]
