"""Fused three_nn + IDW interpolation as a Pallas TPU kernel.

Reference semantics: brute-force running top-3 per unknown point
(pvn3d/_ext-src/src/interpolate_gpu.cu:8-68) followed by the weighted
gather (:70-97) with IDW weights computed from the *distances*
(pointnet2_modules.py:183-187).  The XLA formulation in
``pvn3d_tpu.ops.interpolate`` runs top-k over an (n, m) HBM matrix, then
``three_interpolate`` materializes the (n, 3, C) gathered features — at
the bottom FP level (n=12288, m=2048, C=256) that is the largest single
HBM intermediate of the trunk.

This kernel keeps everything in VMEM: one d^2 tile per (batch row,
unknown tile) program, an exact lexicographic-(d^2, index) 3-round min
extraction (ties resolved exactly as the CUDA running min: equal
distances order by index), and the blend expressed as a one-hot-weighted
(Nt, m) @ (m, C) matmul on the MXU — the (n, 3, C) gather never exists.
Unlike the XLA path's ``approx_min_k`` mode this is *exact*.

Gradients: ``three_interpolate_fused`` carries a custom VJP — cotangents
flow to ``features`` only (deterministic scatter-add, matching
interpolate_gpu.cu:99-154); the coordinate inputs are data, not
parameter-dependent, in every PVN3D use.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_DEF_NT = 512        # unknown rows per program; d2 scratch = Nt * m * 4 B
_BIG = 1e30


def _interp_kernel(m_valid: int, eps: float,
                   un_ref, k_ref, f_ref, out_ref, dist_ref, idx_ref, d2_ref):
    """One (batch row, unknown tile) program.

    un_ref: (1, Nt, 3) f32; k_ref: (1, 3, Mp) f32; f_ref: (1, Mp, C) f32;
    out_ref: (1, Nt, C); dist_ref/idx_ref: (1, Nt, 4) (k padded to 4);
    d2_ref: (Nt, Mp) f32 scratch.
    """
    un = un_ref[0]                                 # (Nt, 3)
    k = k_ref[0]                                   # (3, Mp)
    nt = un.shape[0]
    mp = k.shape[1]

    # Direct (u - k)^2 distances on the VPU: the expanded
    # |u|^2 - 2uk + |k|^2 form fed a depth-3 contraction to the MXU —
    # a 128-deep systolic pass at ~2% utilization (the winner kernel
    # measured the same shape as ~2/3 of its time) — and needed HIGHEST
    # precision to avoid the MXU's bf16 truncation of d^2.  Three
    # broadcast sub+FMA sweeps are exact f32 and cheaper; the direct
    # form also avoids the expanded form's cancellation near ties.
    col = jax.lax.broadcasted_iota(jnp.int32, (nt, mp), 1)
    d2 = jnp.zeros((nt, mp), jnp.float32)
    for c3 in range(3):
        diff = un[:, c3:c3 + 1] - k[c3:c3 + 1, :]
        d2 = d2 + diff * diff
    d2 = jnp.where(col < m_valid, d2, _BIG)
    d2_ref[:, :] = d2

    big_i = jnp.int32(mp)
    prev_v = jnp.full((nt, 1), -1.0, jnp.float32)
    prev_i = jnp.full((nt, 1), -1, jnp.int32)
    vals, idxs = [], []
    for _ in range(3):
        # Lexicographic (d2, index) successor of (prev_v, prev_i) — the
        # CUDA running top-3 orders ties by index (interpolate_gpu.cu:24-38).
        elig = (d2 > prev_v) | ((d2 == prev_v) & (col > prev_i))
        v = jnp.min(jnp.where(elig, d2, _BIG), axis=1, keepdims=True)
        i = jnp.min(jnp.where(elig & (d2 == v), col, big_i), axis=1,
                    keepdims=True)
        vals.append(v)
        idxs.append(i)
        prev_v, prev_i = v, i

    v3 = jnp.concatenate(vals, axis=1)             # (Nt, 3)
    i3 = jnp.concatenate(idxs, axis=1)             # (Nt, 3)
    # m_valid < 3: rounds past the real points select padded columns
    # (d2 == _BIG).  Mirror the CUDA running top-3's initialized state
    # (besti = 0, interpolate_gpu.cu:24-27): index 0 with a huge distance,
    # so the returned idx stays in-range and the IDW weight ~ 0.
    i3 = jnp.where(v3 >= _BIG, 0, i3)
    dist = jnp.sqrt(jnp.maximum(v3, 0.0))
    recip = 1.0 / (dist + eps)
    w = recip / jnp.sum(recip, axis=1, keepdims=True)

    # Blend as a one-hot-weighted matmul: A[i, j] = sum_k w_ik [j == i_ik].
    # This matmul stays at default (bf16) MXU precision deliberately: it is
    # the kernel's dominant FLOP cost (Nt x Mp x C), the features are
    # upcast from the trunk's bf16 compute (truncation is lossless), and
    # the ~2^-9 relative rounding of the IDW weights is the same noise
    # floor as every bf16 matmul downstream.  Selection above is exact.
    a = jnp.zeros((nt, mp), jnp.float32)
    for kk in range(3):
        a = a + jnp.where(col == i3[:, kk:kk + 1], w[:, kk:kk + 1], 0.0)
    out_ref[0] = jax.lax.dot_general(
        a, f_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    zero_col = jnp.zeros((nt, 1), jnp.float32)
    dist_ref[0] = jnp.concatenate([dist, zero_col], axis=1)
    idx_ref[0] = jnp.concatenate([i3, zero_col.astype(jnp.int32)], axis=1)


@functools.partial(jax.jit, static_argnames=("eps", "tile_n", "interpret"))
def _fused_fwd(unknown: jnp.ndarray, known: jnp.ndarray,
               features: jnp.ndarray, eps: float = 1e-8,
               tile_n: int = _DEF_NT, interpret: bool = False):
    b, n, _ = unknown.shape
    m = known.shape[1]
    c = features.shape[-1]
    m_pad = -(-m // _LANES) * _LANES
    nt = min(tile_n, -(-n // 8) * 8)
    n_pad = -(-n // nt) * nt

    un = unknown.astype(jnp.float32)
    k = jnp.transpose(known.astype(jnp.float32), (0, 2, 1))
    f = features.astype(jnp.float32)
    if n_pad != n:
        un = jnp.pad(un, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad - m)))
        f = jnp.pad(f, ((0, 0), (0, m_pad - m), (0, 0)))

    kernel = functools.partial(_interp_kernel, m, eps)
    out, dist, idx = pl.pallas_call(
        kernel,
        grid=(b, n_pad // nt),
        in_specs=[
            pl.BlockSpec((1, nt, 3), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m_pad), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nt, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, 4), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, 4), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 4), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((nt, m_pad), jnp.float32)],
        interpret=interpret,
    )(un, k, f)
    return out[:, :n], dist[:, :n, :3], idx[:, :n, :3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def three_interpolate_fused(unknown, known, features, eps: float = 1e-8,
                            interpret: bool = False):
    """Fused exact 3-NN IDW interpolation: (B, n, 3), (B, m, 3), (B, m, C)
    -> ((B, n, C) blended features, (B, n, 3) distances, (B, n, 3) int32
    indices).  See module docstring; gradient flows to ``features`` only."""
    return _fused_fwd(unknown, known, features, eps=eps, interpret=interpret)


def _fused_fwd_vjp(unknown, known, features, eps, interpret):
    out, dist, idx = _fused_fwd(unknown, known, features, eps=eps,
                                interpret=interpret)
    w = 1.0 / (dist + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    # unknown/known/features ride along for shape/dtype only — their
    # values are unused in bwd and DCE away under jit.
    return (out, dist, idx), (idx, w, unknown, known, features)


def _fused_bwd(eps, interpret, res, cots):
    g_out, _, _ = cots           # dist/idx are non-differentiable outputs
    idx, w, unknown, known, features = res
    _, m, c = features.shape
    n = idx.shape[1]

    def one(idx_b, w_b, g_b):
        rows = idx_b.reshape(n * 3)
        upd = (w_b[..., None] * g_b[:, None, :]).reshape(n * 3, c)
        return jnp.zeros((m, c), g_b.dtype).at[rows].add(upd)

    g_f = jax.vmap(one)(idx, w, g_out).astype(features.dtype)
    return (jnp.zeros_like(unknown), jnp.zeros_like(known), g_f)


three_interpolate_fused.defvjp(_fused_fwd_vjp, _fused_bwd)
