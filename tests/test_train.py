"""Train step, schedules, and mesh sharding."""
import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu.config import Config, TrainConfig
from pvn3d_tpu.data.synthetic import synthetic_batch
from pvn3d_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from pvn3d_tpu.train.schedule import bn_momentum_at, cyclic_lr
from pvn3d_tpu.train.state import create_train_state, param_count
from pvn3d_tpu.train.step import make_eval_step, make_train_step

import __graft_entry__ as graft


def _np_cyclic(it, base, mx, ss):
    # Oracle: reference warmup_scheduler/scheduler.py:255-263.
    cycle = np.floor(1 + it / (2 * ss))
    x = np.abs(it / ss - 2 * cycle + 1)
    return base + (mx - base) * np.maximum(0, 1 - x)


def test_cyclic_lr_matches_reference_formula():
    base, mx, ss = 1e-5, 1e-3, 25 * 4000 // 6
    for it in [0, 1, 100, ss // 2, ss, ss + 7, 2 * ss, 3 * ss + 11, 99999]:
        got = float(cyclic_lr(it, base, mx, ss))
        want = float(_np_cyclic(it, base, mx, ss))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-9)


def test_bn_momentum_matches_reference_formula():
    cfg = TrainConfig()
    # Oracle: train_ycb_pvn3d.py:477-484 (int() floors the exponent).
    for it in [0, 100, 5000, 8333, 8334, 20000, 100000, 10**6]:
        want = max(0.9 * 0.5 ** int(it * cfg.mini_batch_size / 2e5), 1e-2)
        got = float(bn_momentum_at(it, cfg))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_train_step_runs_and_learns():
    cfg = graft._tiny_config()
    batch = synthetic_batch(cfg, batch_size=2,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    rng = jax.random.PRNGKey(0)
    state, model, tx = create_train_state(cfg, rng, batch)
    assert param_count(state.params) > 1e5
    step = jax.jit(make_train_step(cfg, model, tx))
    state, m0 = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m0["loss"]))
    for _ in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 5
    # BN running stats must have moved.
    leaves = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_eval_step_shapes():
    cfg = graft._tiny_config()
    batch = synthetic_batch(cfg, batch_size=2,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    ev = jax.jit(make_eval_step(cfg, model))
    out, metrics = ev(state, batch)
    n = cfg.model.n_sample_points
    assert out["seg_logits"].shape == (2, n, cfg.model.n_classes)
    assert out["kp_offsets"].shape == (2, cfg.model.n_keypoints, n, 3)
    assert out["ctr_offsets"].shape == (2, 1, n, 3)
    assert np.isfinite(float(metrics["loss"]))


def test_dp_sp_sharded_step_matches_single_device():
    cfg = graft._tiny_config()
    batch = synthetic_batch(cfg, batch_size=4,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    rng = jax.random.PRNGKey(0)
    state, model, tx = create_train_state(cfg, rng, batch)
    step = make_train_step(cfg, model, tx)

    _, m_single = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=4, sp=2)
    with mesh:
        state_sh = jax.device_put(state, replicated(mesh))
        batch_sh = shard_batch(mesh, batch)
        _, m_mesh = jax.jit(step)(state_sh, batch_sh, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_mesh["loss"]), rtol=2e-4)


def test_remat_matches_no_remat():
    import dataclasses
    from pvn3d_tpu.config import TrainConfig
    cfg = graft._tiny_config()
    batch = synthetic_batch(cfg, batch_size=2,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    cfg_r = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat=True))
    s1, m1 = jax.jit(make_train_step(cfg, model, tx))(
        state, batch, jax.random.PRNGKey(1))
    s2, m2 = jax.jit(make_train_step(cfg_r, model, tx))(
        state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    a = jax.tree_util.tree_leaves(s1.params)[0]
    b = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # Selective policy ("dots": keep MXU outputs) is a schedule change:
    # same math, but XLA refuses/fuses differently, so allow float
    # reassociation noise (measured ~3e-6 relative on CPU).
    cfg_d = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat=True,
                                       remat_policy="dots"))
    s3, m3 = jax.jit(make_train_step(cfg_d, model, tx))(
        state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m3["loss"]),
                               rtol=3e-5)
    c = jax.tree_util.tree_leaves(s3.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_raw_train_step_sharded():
    """Raw-train path (device augmentation + build + train step) compiles
    and runs under the dp4xsp2 mesh with finite loss — the fully-fused
    'host only decodes PNGs' program of apps/train --device_preprocess."""
    from pvn3d_tpu.data.device_frame import build_train_batch_device
    cfg = graft._tiny_config()
    mc = cfg.model
    h = w = 64
    b = 4
    rng = np.random.RandomState(0)
    raw = {
        "rgb": rng.randint(0, 256, (b, h, w, 3)).astype(np.float32),
        "depth": (0.8 + 0.4 * rng.rand(b, h, w)).astype(np.float32),
        "label_map": rng.randint(0, 3, (b, h, w)).astype(np.int32),
        "cam_k": np.tile(np.array([[60.0, 0, 32], [0, 60, 24], [0, 0, 1]],
                                  np.float32), (b, 1, 1)),
        "cls_ids": np.tile(np.array([1, 2] + [0] * 10, np.int32), (b, 1)),
        "rts": np.tile(np.eye(3, 4, dtype=np.float32), (b, 12, 1, 1)),
        "mesh_kps": rng.rand(b, 12, mc.n_keypoints, 3).astype(np.float32),
        "mesh_ctrs": rng.rand(b, 12, 3).astype(np.float32),
        "is_syn": np.array([True, False, True, False]),
        "back_rgb": rng.randint(0, 256, (b, h, w, 3)).astype(np.float32),
        "back_depth": (0.8 + 0.4 * rng.rand(b, h, w)).astype(np.float32),
        "back_label": rng.randint(0, 2, (b, h, w)).astype(np.int32),
    }
    # Holes in some depths exercise the fill + under-the-mask paths.
    raw["depth"][:, ::7, ::5] = 0.0

    example = synthetic_batch(cfg, batch_size=b,
                              n_points=mc.n_sample_points,
                              height=h, width=w)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0),
                                          example)
    base = make_train_step(cfg, model, tx)

    def step_raw(state, raw_b, rng):
        b_rng = jax.random.fold_in(rng, state.step)
        batch = build_train_batch_device(
            raw_b, b_rng, n_sample=mc.n_sample_points,
            n_classes=mc.n_classes, dataset="ycb")
        return base(state, batch, rng)

    mesh = make_mesh(dp=4, sp=2)
    with mesh:
        state_sh = jax.device_put(state, replicated(mesh))
        raw_sh = shard_batch(mesh, raw)
        new_state, metrics = jax.jit(step_raw)(state_sh, raw_sh,
                                               jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1


def test_grad_accum_matches_full_batch_on_duplicated_halves():
    """grad_accum=2 on a batch whose two halves are identical must produce
    the same params/opt_state as one full-batch step: each micro-batch's
    BN statistics equal the full batch's (duplicated data), micro losses
    are equal, and the averaged grads equal the full-batch grads.  (On
    non-duplicated data BN normalization differs per micro-batch — the
    documented torch-style accumulation semantics, config.py.)"""
    import dataclasses
    cfg = graft._tiny_config()
    # Dropout draws independent masks per micro-batch — zero it so the
    # equivalence is exact.
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, cnn=dataclasses.replace(
            cfg.model.cnn, dropout_psp=0.0, dropout_up=0.0)))
    half = synthetic_batch(cfg, batch_size=2,
                           n_points=cfg.model.n_sample_points,
                           height=64, width=64)
    batch = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch)

    cfg_a = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=2))
    s1, m1 = jax.jit(make_train_step(cfg, model, tx))(
        state, batch, jax.random.PRNGKey(1))
    s2, m2 = jax.jit(make_train_step(cfg_a, model, tx))(
        state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
    # Tolerances: the equivalence is exact analytically, but the joint
    # batch's BN statistics round differently in f32 than the halves'
    # (sums over 4 vs 2 frames, ~1e-6), and at random init that flips a
    # few ReLU/max-pool boundary units — measured grad noise ~1e-2
    # relative on isolated entries, params ~2e-5 after one Adam step.
    # The wiring bugs this test exists to catch (summing vs averaging =
    # 2x on everything; a wrong seg scale = 50% on the seg term) are
    # orders of magnitude above these bounds.
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    # Optimizer moments are linear/quadratic in the raw grads, so a few
    # boundary-flipped entries dominate elementwise comparison; per-leaf
    # norm-relative distance absorbs the chaos tail while a factor-type
    # wiring bug (0.5x / 2x) would read ~0.5 here.
    for a, b in zip(jax.tree_util.tree_leaves(s2.opt_state),
                    jax.tree_util.tree_leaves(s1.opt_state)):
        if hasattr(a, "shape") and a.dtype.kind == "f":
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if max(na, nb) < 1e-4:
                # Bias-before-BN leaves (true gradient exactly zero —
                # BN subtracts the mean; the ~1e-7 moments are f32
                # cancellation residue) and single-scalar moments (PReLU
                # alpha) are noise over noise; factor bugs still show on
                # the hundreds of real leaves.
                continue
            nd = np.linalg.norm(a - b) / (na + 1e-12)
            # Measured chaos ceiling ~1e-2 (a flipped entry dominating a
            # small quadratic-moment leaf); a factor bug reads ~0.5.
            assert nd < 5e-2, f"opt_state leaf rel-norm diff {nd}"


def test_grad_accum_rejects_indivisible_batch():
    import dataclasses
    import pytest
    cfg = graft._tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=3))
    batch = synthetic_batch(cfg, batch_size=2,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(make_train_step(cfg, model, tx))(
            state, batch, jax.random.PRNGKey(1))
