"""Ball query + feature grouping, TPU-native.

The reference's CUDA ball query scans points in index order and keeps the
first ``nsample`` indices with d^2 < radius^2, pre-filling all slots with the
first hit (pvn3d/_ext-src/src/ball_query_gpu.cu:26-43); grouping gathers
features by the (npoint, nsample) index table with atomicAdd scatter
gradients (group_points_gpu.cu:6-75).

TPU formulation: "first nsample within radius" == the nsample *smallest
masked indices* — a selection problem, not a scatter problem.  Scores are
``index if hit else N``; selection runs as one of

  * ``pallas`` — the fused VMEM-resident kernel
    (``ops.pallas.query.ball_query_pallas``): one d^2 tile on-chip shared
    by every scale, residue-class candidate extraction, no (m, N) HBM
    round-trips.  The TPU default (``auto``): measured on-chip it is
    5.7x approx at L0 (0.78 vs 4.43 ms), ~even at the small levels,
    ~3.9 ms off the honest full pipeline (chip_report_r3.json bench A/B,
    post-input-salting methodology), with 100% in-radius
    validity and 100% first-ns recall on realistic scanline clouds
    (benchmarks/query_validate.py) and the best end-to-end accuracy of
    the three modes on the synthetic e2e world (ADD-AUC 33.8 vs 33.0
    exact / 32.6 approx, same checkpoint).
  * ``approx`` — ``lax.approx_min_k``, the TPU-optimized two-stage
    reduction (hardware bucketing + exact top-k over candidates).  33x the
    scatter/scan formulation this replaced; on depth-camera clouds the hit
    sets are small enough that it recovers the exact answer in practice
    (recall_target 0.99 by default: ~99% neighbor-set recall on dense
    depth clouds, with misses replaced by other in-radius points — the
    reference's own first-k rule is an order-biased subsample.  0.999 is
    effectively exact but costs ~2x across the levels; exact `top_k` ~5x).
  * ``exact`` — ``lax.top_k`` on the negated scores; bit-exact selection
    (first-k-in-order incl. ties).  Exact mode also computes d^2 in the
    direct (c - x)^2 form instead of the expanded |c|^2 - 2c.x + |x|^2:
    the expansion's f32 cancellation (~|p|^2 * 2^-24) moves the radius
    boundary relative to the reference kernel's per-pair dx^2+dy^2+dz^2
    (ball_query_gpu.cu:30-34), so parity mode matches the reference's own
    arithmetic; membership then agrees to f32 rounding of the same
    expression (GPU FMA contraction can still differ by 1 ulp).  The
    throughput modes keep the expanded MXU form.

The (m, N) distance tiles are chunked over centroids so the full matrix
never exceeds a few tens of MB.  Gathers are ``take_along_axis`` whose VJP
is XLA's deterministic scatter-add (vs. the reference's nondeterministic
atomicAdd).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=("radius", "nsample", "mode", "chunk_m", "recall",
                     "compute_dtype", "capacity"))
def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray, mode: str = "auto",
               chunk_m: int = 512, recall: float = 0.99,
               compute_dtype: str = "f32", capacity: int = 2) -> jnp.ndarray:
    """For each centroid, indices of the first ``nsample`` points within
    ``radius`` (in point order), padded with the first hit.

    Args:
      radius: ball radius (strict d^2 < radius^2, ball_query_gpu.cu:34).
      nsample: max neighbors per centroid.
      xyz: (B, N, 3) support points.
      new_xyz: (B, m, 3) query centroids.
      mode: "approx" | "exact" | "auto" (approx on TPU).
      compute_dtype: "f32" or "bf16" for the distance matrix.  bf16
        halves the MXU/HBM cost of the (m, N) d^2 computation; the
        selection scores stay f32 (iota up to N must stay exact).
        Coordinate rounding moves the radius boundary by ~0.4% —
        validate per-dataset before using on the accuracy path.

    Returns:
      (B, m, nsample) int32 indices; centroids with no hit get index 0
      (matching the reference's zero-initialized output buffer).
    """
    return ball_query_multi((radius,), (nsample,), xyz, new_xyz, mode=mode,
                            chunk_m=chunk_m, recall=recall,
                            compute_dtype=compute_dtype,
                            capacity=capacity)[0]


def ball_query_multi(radii, nsamples, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray, mode: str = "auto",
                     chunk_m: int = 512, recall: float = 0.99,
                     compute_dtype: str = "f32", capacity: int = 2):
    """Ball query for several (radius, nsample) scales sharing one distance
    matrix — the MSG grouping pattern (two scales per SA level,
    pvn3d/lib/pvn3d.py:67-112) computes d^2 once instead of per scale.

    Returns a list of (B, m, nsample_s) int32 index tables, one per scale.
    """
    if mode == "auto":
        mode = "pallas" if jax.default_backend() == "tpu" else "exact"
    radii = tuple(radii)
    nsamples = tuple(nsamples)
    if mode == "pallas":
        from pvn3d_tpu.ops.pallas.query import ball_query_pallas
        return ball_query_pallas(radii, nsamples, xyz, new_xyz,
                                 capacity=capacity,
                                 interpret=jax.default_backend() != "tpu")

    def single(x, c):
        if compute_dtype == "bf16":
            x = x.astype(jnp.bfloat16)
            c = c.astype(jnp.bfloat16)
        n = x.shape[0]
        m = c.shape[0]
        x_sq = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)
        n_chunks = max(1, -(-m // chunk_m))
        pad = n_chunks * chunk_m - m
        cen = jnp.pad(c, ((0, pad), (0, 0))) if pad else c
        cen = cen.reshape(n_chunks, chunk_m, 3)

        def per_chunk(cc):
            if mode == "exact":
                # Parity form: per-pair (dx^2+dy^2+dz^2) like the
                # reference kernel — no |c|^2-2c.x+|x|^2 cancellation at
                # the radius boundary (module docstring).  VPU work, fine
                # for the opt-in parity mode.
                ccf = cc.astype(jnp.float32)
                xf = x.astype(jnp.float32)
                d2 = sum((ccf[:, None, i] - xf[None, :, i]) ** 2
                         for i in range(3))
            else:
                c_sq = jnp.sum(cc.astype(jnp.float32) ** 2, axis=-1)
                # HIGHEST precision is load-bearing: the TPU MXU's default
                # truncates f32 operands to bf16, perturbing d^2 by ~1e-2
                # on unit-scale clouds — swamping r^2 = 3e-4 at L0
                # (measured on-chip: in-radius fraction 0.76 / recall 0.21
                # before the fix; CPU tests compute exact f32 and can't
                # see it).  K=3 keeps full precision essentially free.
                cross = jnp.dot(cc, x.T, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                d2 = c_sq[:, None] - 2.0 * cross + x_sq[None, :]
            iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            outs = []
            for radius, nsample in zip(radii, nsamples):
                hit = d2 < jnp.float32(radius * radius)
                score = jnp.where(hit, iota, n).astype(jnp.float32)
                k = min(nsample, n)
                if mode == "approx":
                    vals, _ = jax.lax.approx_min_k(score, k,
                                                   recall_target=recall)
                    idx = vals.astype(jnp.int32)
                else:
                    neg, _ = jax.lax.top_k(-score, k)
                    idx = (-neg).astype(jnp.int32)
                if k < nsample:
                    idx = jnp.concatenate(
                        [idx, jnp.broadcast_to(
                            idx[:, :1], (idx.shape[0], nsample - k))],
                        axis=1)
                # Pad trailing slots with the first hit; no-hit centroids
                # get 0 (ball_query_gpu.cu:35-39 + zero-initialized
                # output).  ``found`` masks filler slots (score n == no
                # in-radius point selected): a centroid with <= k hits
                # where approx missed one must repeat the first hit,
                # never admit a far point.  Selection values come back
                # sorted ascending, so valid entries are a prefix — no
                # (m, N) hit-count pass needed (saves a full HBM pass
                # per scale, ~1.7 ms at L0, measured).
                found = idx < n
                first = jnp.where(found[:, 0], idx[:, 0], 0)
                outs.append(jnp.where(found, idx, first[:, None]))
            return tuple(outs)

        outs = jax.lax.map(per_chunk, cen)
        return tuple(o.reshape(n_chunks * chunk_m, -1)[:m] for o in outs)

    outs = jax.vmap(single)(xyz, new_xyz)
    return list(outs)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features by a grouping index table.

    (B, N, C), (B, m, ns) -> (B, m, ns, C), channels-last.  Differentiable;
    replaces the reference's atomicAdd backward (group_points_gpu.cu:60) with
    XLA's deterministic scatter-add.
    """
    b, n, c = points.shape
    _, m, ns = idx.shape
    flat = idx.reshape(b, m * ns, 1).astype(jnp.int32)
    out = jnp.take_along_axis(points, flat, axis=1)
    return out.reshape(b, m, ns, c)


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "use_xyz", "mode"))
def query_and_group(radius: float, nsample: int, xyz: jnp.ndarray,
                    new_xyz: jnp.ndarray, features: jnp.ndarray | None = None,
                    use_xyz: bool = True, mode: str = "auto") -> jnp.ndarray:
    """Fused ball query + grouping + centroid-centering.

    Semantics of the reference's QueryAndGroup module
    (pointnet2_utils.py:276-330): grouped xyz are centered on their centroid
    and concatenated with grouped features when ``use_xyz``.

    Returns: (B, m, ns, 3 + C) channels-last grouped features.
    """
    idx = ball_query(radius, nsample, xyz, new_xyz, mode=mode)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feat = group_points(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
        return grouped_feat
    if not use_xyz:
        raise ValueError("Cannot have no features and use_xyz=False")
    return grouped_xyz
