"""Fused multi-scale ball query as a Pallas TPU kernel.

Reference semantics (pvn3d/_ext-src/src/ball_query_gpu.cu:26-43): for each
centroid, the first ``nsample`` point indices with d^2 < r^2 in index order,
trailing slots padded with the first hit, 0 when nothing hits.  The XLA
formulation in ``pvn3d_tpu.ops.grouping`` selects the nsample smallest
masked indices with ``lax.approx_min_k``; at recall 0.99 its exact
aggregation phase scans a 6144-wide candidate buffer per row (~2.2 ms per
scale at L0: m=2048, N=12288) and the (m, N) score matrix round-trips HBM
once per scale.

This kernel keeps the whole problem in VMEM and exploits the one structural
fact XLA's generic top-k cannot: the scores ARE the column indices.  Points
are viewed in 128 interleaved residue classes (class = index % 128 = lane),
so the c-th smallest hit of each class is extracted with a pure lane-local
pass over the d^2 tile — no cross-lane work, no sort:

  for c in 1..C:   cand[c, lane] = min over j of
                     {score[j*128+lane] : score > cand[c-1, lane]}

Per-class scores are strictly increasing, so a per-lane lower bound replaces
the usual mask-update pass.  The final first-k is the k smallest of the
(128*C,) candidates per row, extracted the same way (k rounds on two lane
tiles).  Exactness: the result equals the reference's first-k whenever no
residue class contains more than C of the true first k hits — k hits spread
over >= k/C classes.  Consecutive indices land in consecutive classes, so
the clustered hit runs of scanline depth clouds are the *friendly* case;
violations need C+1 first-k hits exactly 128 apart.  Any substitution is
still another in-radius point (the approx-mode contract, grouping.py:13-20).
A centroid with <= k hits loses nothing: every hit of a class with <= C hits
is a candidate, and dropped hits only come from classes holding > C.

Both scales of an MSG level (pvn3d/lib/pvn3d.py:67-112) share one d^2 tile
computed once on the MXU into VMEM scratch; HBM traffic is the points
(N x 3) per program plus the index tables out — the (m, N) matrix never
leaves the chip.  Measured at L0 vs the approx path: see CLAUDE.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_DEF_MT = 128          # centroid rows per program; d2 scratch = Mt*N*4 bytes


def _query_kernel(n_valid: int, radii, nsamples, capacity: int,
                  x_ref, c_ref, *rest):
    """One (batch row, centroid tile) program.

    x_ref: (1, 3, Np) f32 points; c_ref: (1, 3, Mt) f32 centroids (both
    coordinate-major so the minor dim is lane-packed); rest: one
    (1, Mt, ns) i32 out ref per scale, then the (Mt, Np) f32 d2 scratch.
    """
    out_refs, d2_ref = rest[:-1], rest[-1]
    x = x_ref[0]                                  # (3, Np)
    c = c_ref[0]                                  # (3, Mt)
    mt = c.shape[1]
    npad = x.shape[1]
    w = npad // _LANES
    big = jnp.float32(npad)

    x_sq = jnp.sum(x * x, axis=0, keepdims=True)  # (1, Np)
    c_sq = jnp.sum(c * c, axis=0)[:, None]        # (Mt, 1)
    # HIGHEST precision is mandatory: the MXU's default precision truncates
    # f32 operands to bf16, whose ~2^-8 relative error on unit-scale clouds
    # perturbs d2 by ~1e-2 — swamping r^2 = 3e-4 at L0 (measured on-chip:
    # in_radius_frac 0.76 before the fix; interpret mode hid it by
    # computing exact f32).  benchmarks/query_validate.py audits this.
    cross = jax.lax.dot_general(
        c, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    d2_ref[:, :] = c_sq - 2.0 * cross + x_sq      # (Mt, Np)

    lane = jax.lax.broadcasted_iota(jnp.int32, (mt, _LANES), 1)
    lane_f = lane.astype(jnp.float32)

    for s, (radius, nsample) in enumerate(zip(radii, nsamples)):
        r2 = jnp.float32(radius * radius)
        # Per-residue-class candidate extraction: round c's min is the
        # smallest score strictly above round c-1's (scores are unique
        # per class), so no mask-update pass is needed.
        cands = []
        prev = jnp.full((mt, _LANES), -1.0, jnp.float32)
        for _ in range(capacity):
            m = jnp.full((mt, _LANES), big, jnp.float32)
            for j in range(w):
                blk = d2_ref[:, j * _LANES:(j + 1) * _LANES]
                score = jnp.float32(j * _LANES) + lane_f
                ok = ((blk < r2) & (score > prev)
                      & (lane < n_valid - j * _LANES))
                m = jnp.minimum(m, jnp.where(ok, score, big))
            cands.append(m)
            prev = m
        cand = jnp.concatenate(cands, axis=1)     # (Mt, 128*capacity)

        # First-k over the candidates, same strictly-increasing extraction.
        vals = []
        prev_v = jnp.full((mt, 1), -1.0, jnp.float32)
        for _ in range(nsample):
            v = jnp.min(jnp.where(cand > prev_v, cand, big), axis=1,
                        keepdims=True)
            vals.append(v)
            prev_v = v
        sel = jnp.concatenate(vals, axis=1)       # (Mt, ns) f32
        idx = sel.astype(jnp.int32)
        found = sel < big
        first = jnp.where(found[:, :1], idx[:, :1], 0)
        out_refs[s][0] = jnp.where(found, idx, first)


@functools.partial(jax.jit, static_argnames=("radii", "nsamples", "capacity",
                                             "interpret"))
def ball_query_pallas(radii, nsamples, xyz: jnp.ndarray,
                      new_xyz: jnp.ndarray, capacity: int = 2,
                      interpret: bool = False):
    """Multi-scale ball query: (B, N, 3), (B, m, 3) ->
    [(B, m, ns) int32 per scale].  See module docstring for semantics."""
    radii = tuple(radii)
    nsamples = tuple(nsamples)
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    n_pad = -(-n // _LANES) * _LANES
    mt = min(_DEF_MT, -(-m // 8) * 8)
    m_pad = -(-m // mt) * mt
    x = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))       # (B, 3, N)
    cen = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, m)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n)))
    if m_pad != m:
        cen = jnp.pad(cen, ((0, 0), (0, 0), (0, m_pad - m)))

    kernel = functools.partial(_query_kernel, n, radii, nsamples, capacity)
    outs = pl.pallas_call(
        kernel,
        grid=(b, m_pad // mt),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, mt), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, mt, ns), lambda bi, ti: (bi, ti, 0),
                                memory_space=pltpu.VMEM)
                   for ns in nsamples],
        out_shape=[jax.ShapeDtypeStruct((b, m_pad, ns), jnp.int32)
                   for ns in nsamples],
        scratch_shapes=[pltpu.VMEM((mt, n_pad), jnp.float32)],
        interpret=interpret,
    )(x, cen)
    return [o[:, :m] for o in outs]
