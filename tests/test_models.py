"""Shape/semantics tests for the model stack on tiny inputs.

Small image (64x64) and point counts so the full forward runs in seconds on
the CPU test platform; the architecture widths are still the real ones.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvn3d_tpu import config as C
from pvn3d_tpu.models.layers import (
    BatchNorm, SharedMLP, adaptive_avg_pool, resize_bilinear)
from pvn3d_tpu.models.losses import focal_loss, offset_l1_loss, seg_accuracy


def small_config(n_classes=5, n_kps=8):
    """Real layer structure, reduced point counts for test speed."""
    pn2 = C.PointNet2Config(
        sa_levels=(
            C.SALevelConfig(64, (0.1, 0.2), (8, 16), ((8, 16), (8, 16))),
            C.SALevelConfig(16, (0.2, 0.4), (8, 16), ((16, 32), (16, 32))),
        ),
        fp_mlps=((32, 32), (64, 64)),
    )
    return C.ModelConfig(
        n_classes=n_classes, n_keypoints=n_kps, n_sample_points=128,
        pointnet2=pn2, image_height=64, image_width=64,
        seg_head=(64, 32), kp_head=(64, 32), ctr_head=(64, 32),
        compute_dtype="float32",
    )


class TestLayers:
    def test_batchnorm_train_normalizes(self):
        bn = BatchNorm(use_running_average=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 8)) * 5 + 3
        vars_ = bn.init(jax.random.PRNGKey(1), x)
        y, mut = bn.apply(vars_, x, 0.5, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y).mean((0, 1)), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y).std((0, 1)), 1.0, atol=1e-2)
        # Torch-convention momentum: running <- (1-m)*run + m*batch.
        rm = np.asarray(mut["batch_stats"]["BatchNorm_0"]["mean"]) \
            if "BatchNorm_0" in mut["batch_stats"] else \
            np.asarray(mut["batch_stats"]["mean"])
        batch_mean = np.asarray(x).mean((0, 1))
        np.testing.assert_allclose(rm, 0.5 * batch_mean, atol=1e-4)

    def test_batchnorm_eval_uses_running(self):
        bn = BatchNorm(use_running_average=True)
        x = jnp.ones((2, 4, 3)) * 7
        vars_ = bn.init(jax.random.PRNGKey(0), x)
        y = bn.apply(vars_, x)
        # running mean 0, var 1 -> output ~= input.
        np.testing.assert_allclose(np.asarray(y), 7.0, atol=1e-2)

    def test_resize_bilinear_matches_numpy_align_corners(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        y = np.asarray(resize_bilinear(x, 7, 7, align_corners=True))[0, :, :, 0]
        # corners preserved under align_corners
        assert y[0, 0] == 0.0 and y[-1, -1] == 15.0
        assert abs(y[3, 3] - 7.5) < 1e-5  # center

    def test_resize_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 6, 3))
        y = resize_bilinear(x, 5, 6, align_corners=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_resize_lerp_matches_matmul(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 13, 5))
        for ac, (oh, ow) in [(True, (18, 26)), (False, (5, 40)),
                             (True, (9, 13))]:
            a = resize_bilinear(x, oh, ow, align_corners=ac)
            b = resize_bilinear(x, oh, ow, align_corners=ac, method="lerp")
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)

    def test_resize_matmul_packed_matches_matmul(self):
        # Lane-packed form must be exactly the plain matmul form, for
        # even and odd spatial sizes (odd falls back per-pass) and for
        # both corner conventions, including the PSP upsample shape
        # regime (2x upsample at C=64-ish).
        for key, shape, ac, (oh, ow) in [
                (0, (2, 6, 8, 3), True, (12, 16)),
                (1, (2, 9, 13, 5), True, (18, 26)),   # odd src dims
                (2, (1, 4, 6, 4), False, (7, 40)),    # odd out_h
                (3, (2, 30, 40, 64), True, (60, 80)),  # PSP stage shape
                (4, (1, 5, 6, 2), False, (5, 6))]:
            x = jax.random.normal(jax.random.PRNGKey(key), shape)
            a = resize_bilinear(x, oh, ow, align_corners=ac)
            b = resize_bilinear(x, oh, ow, align_corners=ac,
                                method="matmul_packed")
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def test_adaptive_pool_matches_torch_binning(self):
        # 80 -> 6 bins: torch uses floor/ceil bin edges.
        x = jnp.arange(80.0).reshape(1, 1, 80, 1)
        y = np.asarray(adaptive_avg_pool(x, 1, 6))[0, 0, :, 0]
        edges = [(i * 80 // 6, -((-(i + 1) * 80) // 6)) for i in range(6)]
        expect = [np.arange(lo, hi).mean() for lo, hi in edges]
        np.testing.assert_allclose(y, expect, atol=1e-5)

    def test_shared_mlp_shapes(self):
        mlp = SharedMLP((16, 32), train=True)
        x = jnp.ones((2, 8, 4, 6))
        vars_ = mlp.init(jax.random.PRNGKey(0), x)
        y, _ = mlp.apply(vars_, x, 0.9, mutable=["batch_stats"])
        assert y.shape == (2, 8, 4, 32)


class TestLosses:
    def test_focal_matches_ce_at_gamma0(self):
        key = jax.random.PRNGKey(0)
        logits = jax.random.normal(key, (4, 10, 5))
        labels = jax.random.randint(jax.random.PRNGKey(1), (4, 10), 0, 5)
        fl = float(focal_loss(logits, labels, gamma=0.0))
        logp = jax.nn.log_softmax(logits, -1)
        ce = -np.take_along_axis(np.asarray(logp),
                                 np.asarray(labels)[..., None], -1).mean()
        assert abs(fl - ce) < 1e-5

    def test_focal_downweights_easy(self):
        easy = jnp.array([[[4.0, -4.0]]])
        hard = jnp.array([[[0.5, -0.5]]])
        lab = jnp.array([[0]])
        # gamma>0 shrinks easy-example loss far more than hard-example loss.
        ratio_easy = float(focal_loss(easy, lab, 2.0) / focal_loss(easy, lab, 0.0))
        ratio_hard = float(focal_loss(hard, lab, 2.0) / focal_loss(hard, lab, 0.0))
        assert ratio_easy < ratio_hard

    def test_offset_l1_oracle(self):
        rng = np.random.RandomState(0)
        b, nk, n = 2, 3, 16
        pred = rng.randn(b, nk, n, 3).astype(np.float32)
        tgt = rng.randn(b, n, nk, 3).astype(np.float32)
        labels = (rng.rand(b, n) > 0.5).astype(np.float32) * 3
        ours = float(offset_l1_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                    jnp.asarray(labels)))
        # numpy oracle with the reference's exact normalization
        w = (labels > 1e-8).astype(np.float32)
        tgt_t = tgt.transpose(0, 2, 1, 3)
        diff = np.abs(pred - tgt_t) * w[:, None, :, None]
        per_kp = diff.sum((2, 3)) / (w.sum(1)[:, None] + 1e-3)
        assert abs(ours - per_kp.sum()) < 1e-4

    def test_offset_l1_masks_background(self):
        pred = jnp.ones((1, 2, 8, 3)) * 100.0
        tgt = jnp.zeros((1, 8, 2, 3))
        labels = jnp.zeros((1, 8))
        assert float(offset_l1_loss(pred, tgt, labels)) == 0.0

    def test_seg_accuracy(self):
        logits = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
        labels = jnp.array([[0, 0]])
        assert float(seg_accuracy(logits, labels)) == 0.5


class TestPVN3D:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        from pvn3d_tpu.models import PVN3D
        cfg = small_config()
        # Dense CNN tail: this fixture tests the dense output contract
        # (rgb_seg map); the sparse eval default is covered below.
        model = PVN3D(cfg=cfg, train=False, sparse_cnn=False)
        b, n = 1, cfg.n_sample_points
        key = jax.random.PRNGKey(0)
        pcld = jax.random.normal(key, (b, n, 9)) * 0.3
        rgb = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 3))
        choose = jax.random.randint(jax.random.PRNGKey(2), (b, n), 0, 64 * 64)
        vars_ = model.init(jax.random.PRNGKey(3), pcld, rgb, choose)
        return model, vars_, cfg, (pcld, rgb, choose)

    def test_forward_shapes(self, model_and_vars):
        model, vars_, cfg, (pcld, rgb, choose) = model_and_vars
        out = model.apply(vars_, pcld, rgb, choose)
        b, n = pcld.shape[0], pcld.shape[1]
        assert out["seg_logits"].shape == (b, n, cfg.n_classes)
        assert out["kp_offsets"].shape == (b, cfg.n_keypoints, n, 3)
        assert out["ctr_offsets"].shape == (b, 1, n, 3)
        assert out["rgb_seg"].shape == (b, 64, 64, cfg.n_classes)
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))

    def test_eval_default_is_sparse_and_equivalent(self, model_and_vars):
        """sparse_cnn=None resolves to ModelConfig.sparse_cnn_eval (True)
        in eval mode: per-point seg instead of the dense map, same head
        outputs, and the per-point rgb_seg equals the dense map gathered
        at ``choose`` (the sparse tail is output-equivalent)."""
        from pvn3d_tpu.models import PVN3D
        dense_model, vars_, cfg, (pcld, rgb, choose) = model_and_vars
        auto = PVN3D(cfg=cfg, train=False)
        out_a = auto.apply(vars_, pcld, rgb, choose)
        out_d = dense_model.apply(vars_, pcld, rgb, choose)
        b, n = pcld.shape[0], pcld.shape[1]
        assert out_a["rgb_seg"].shape == (b, n, cfg.n_classes)
        dense_flat = np.asarray(out_d["rgb_seg"]).reshape(b, -1,
                                                          cfg.n_classes)
        gathered = np.take_along_axis(
            dense_flat, np.asarray(choose)[..., None], axis=1)
        np.testing.assert_allclose(np.asarray(out_a["rgb_seg"]), gathered,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out_a["seg_logits"]),
                                   np.asarray(out_d["seg_logits"]),
                                   atol=1e-4)

    def test_fusion_dim(self, model_and_vars):
        # The fused feature must be 1792-d with the real config widths
        # (256 + 512 + 1024, reference pvn3d.py:182).
        from pvn3d_tpu.models.pvn3d import DenseFusion
        df = DenseFusion(train=False)
        r = jnp.ones((1, 16, 128))
        c = jnp.ones((1, 16, 128))
        vars_ = df.init(jax.random.PRNGKey(0), r, c)
        y = df.apply(vars_, r, c)
        assert y.shape == (1, 16, 1792)

    def test_train_mode_mutates_stats(self, model_and_vars):
        from pvn3d_tpu.models import PVN3D
        _, vars_, cfg, (pcld, rgb, choose) = model_and_vars
        model_t = PVN3D(cfg=cfg, train=True)
        out, mut = model_t.apply(
            vars_, pcld, rgb, choose, 0.9,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(4)})
        assert "batch_stats" in mut
        leaves = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)

    def test_grad_flows(self, model_and_vars):
        from pvn3d_tpu.models import PVN3D
        _, vars_, cfg, (pcld, rgb, choose) = model_and_vars
        model_t = PVN3D(cfg=cfg, train=True)
        labels = jnp.zeros((1, cfg.n_sample_points), jnp.int32)

        def loss_fn(params):
            out, _ = model_t.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                pcld, rgb, choose, 0.9, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(5)})
            return focal_loss(out["seg_logits"], labels)

        grads = jax.grad(loss_fn)(vars_["params"])
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        # at least one nonzero grad in each branch
        norms = [float(jnp.abs(g).max()) for g in flat]
        assert max(norms) > 0


class TestFPSPrefixModel:
    def test_pointnet2_prefix_equals_per_level_fps(self):
        """fps_prefix slices SA levels > 0 instead of re-running FPS;
        greedy-FPS prefix consistency makes the trunk output bit-identical
        (ops-level property: tests/test_ops.py::TestFPSPrefix)."""
        from pvn3d_tpu.models.pointnet2 import PointNet2MSG
        import dataclasses
        cfg = small_config().pointnet2
        rng = np.random.RandomState(0)
        pc = jnp.asarray(rng.uniform(-1, 1, (2, 128, 6)).astype(np.float32))
        outs = {}
        for prefix in (False, True):
            c = dataclasses.replace(cfg, fps_prefix=prefix,
                                    query_mode="exact")
            m = PointNet2MSG(cfg=c, train=False)
            vars_ = m.init(jax.random.PRNGKey(0), pc)
            outs[prefix] = np.asarray(m.apply(vars_, pc))
        np.testing.assert_array_equal(outs[False], outs[True])


class TestPallasQueryModel:
    def test_pointnet2_pallas_mode_close_to_exact(self):
        """query_mode='pallas' routes SA ball query to the fused Pallas
        kernel and FP interpolation to the fused 3-NN kernel (interpret
        mode off-TPU).  On small clouds (N <= 128*capacity) both are
        exact, so the trunk output matches the exact path bitwise up to
        the f32 matmul reassociation in the fused IDW blend."""
        from pvn3d_tpu.models.pointnet2 import PointNet2MSG
        import dataclasses
        cfg = small_config().pointnet2
        rng = np.random.RandomState(0)
        pc = jnp.asarray(rng.uniform(-1, 1, (2, 128, 6)).astype(np.float32))
        outs = {}
        for mode in ("exact", "pallas"):
            c = dataclasses.replace(cfg, query_mode=mode)
            m = PointNet2MSG(cfg=c, train=False)
            vars_ = m.init(jax.random.PRNGKey(0), pc)
            outs[mode] = np.asarray(m.apply(vars_, pc))
        np.testing.assert_allclose(outs["pallas"], outs["exact"],
                                   rtol=2e-4, atol=2e-4)

    def test_interp_mode_decoupled_from_query_mode(self):
        """interp_mode='pallas' swaps ONLY the FP interpolation for the
        fused exact 3-NN kernel while the SA ball query stays exact —
        output must match the all-exact trunk up to the fused IDW blend's
        f32 dot reassociation (the kernel itself is exact,
        tests/test_pallas.py::test_matches_exact_path)."""
        from pvn3d_tpu.models.pointnet2 import PointNet2MSG
        import dataclasses
        cfg = small_config().pointnet2
        rng = np.random.RandomState(3)
        pc = jnp.asarray(rng.uniform(-1, 1, (2, 128, 6)).astype(np.float32))
        outs = {}
        for imode in ("exact", "pallas"):
            c = dataclasses.replace(cfg, query_mode="exact",
                                    interp_mode=imode)
            m = PointNet2MSG(cfg=c, train=False)
            vars_ = m.init(jax.random.PRNGKey(0), pc)
            outs[imode] = np.asarray(m.apply(vars_, pc))
        np.testing.assert_allclose(outs["pallas"], outs["exact"],
                                   rtol=2e-4, atol=2e-4)


class TestSAPrecomputeFirst:
    def test_eval_forward_matches_standard_path(self):
        """Gather-after-matmul SA evaluation (sa_precompute_first) vs the
        standard grouped path: exact up to one f32 add reassociation."""
        from pvn3d_tpu.models.pointnet2 import PointNet2MSG
        import dataclasses
        cfg = small_config().pointnet2
        rng = np.random.RandomState(3)
        pc = jnp.asarray(rng.uniform(-1, 1, (2, 128, 6)).astype(np.float32))
        outs = {}
        for flag in (False, True):
            c = dataclasses.replace(cfg, sa_precompute_first=flag,
                                    query_mode="exact")
            m = PointNet2MSG(cfg=c, train=False)
            vars_ = m.init(jax.random.PRNGKey(0), pc)
            outs[flag] = np.asarray(m.apply(vars_, pc))
        np.testing.assert_allclose(outs[True], outs[False],
                                   rtol=1e-5, atol=1e-5)

    def test_train_mode_ignores_flag(self):
        """Training keeps the standard path (grouped batch stats feed BN):
        the flag must not change train-mode outputs at all."""
        from pvn3d_tpu.models.pointnet2 import PointNet2MSG
        import dataclasses
        cfg = small_config().pointnet2
        rng = np.random.RandomState(4)
        pc = jnp.asarray(rng.uniform(-1, 1, (2, 128, 6)).astype(np.float32))
        outs = {}
        for flag in (False, True):
            c = dataclasses.replace(cfg, sa_precompute_first=flag,
                                    query_mode="exact")
            m = PointNet2MSG(cfg=c, train=True)
            vars_ = m.init(jax.random.PRNGKey(0), pc)
            out, _ = m.apply(vars_, pc, mutable=["batch_stats"])
            outs[flag] = np.asarray(out)
        np.testing.assert_array_equal(outs[True], outs[False])

    def test_bf16_path_within_rounding(self):
        """Under bf16 compute the split-add reassociation stays within
        bf16 rounding (max abs ~2e-3 on O(1) features)."""
        from pvn3d_tpu.models.pointnet2 import PointNet2MSG
        import dataclasses
        cfg = small_config().pointnet2
        rng = np.random.RandomState(3)
        pc = jnp.asarray(rng.uniform(-1, 1, (2, 128, 6)).astype(np.float32))
        outs = {}
        for flag in (False, True):
            c = dataclasses.replace(cfg, sa_precompute_first=flag,
                                    query_mode="exact")
            m = PointNet2MSG(cfg=c, train=False, dtype=jnp.bfloat16)
            vars_ = m.init(jax.random.PRNGKey(0), pc)
            outs[flag] = np.asarray(m.apply(vars_, pc), np.float32)
        np.testing.assert_allclose(outs[True], outs[False], atol=6e-3)


class TestFPPrecomputeFirst:
    def _run(self, flag, train=False, dtype=jnp.float32, query_mode="exact"):
        from pvn3d_tpu.models.pointnet2 import PointNet2MSG
        import dataclasses
        cfg = small_config().pointnet2
        rng = np.random.RandomState(7)
        pc = jnp.asarray(rng.uniform(-1, 1, (2, 128, 6)).astype(np.float32))
        c = dataclasses.replace(cfg, fp_precompute_first=flag,
                                query_mode=query_mode)
        m = PointNet2MSG(cfg=c, train=train, dtype=dtype)
        vars_ = m.init(jax.random.PRNGKey(0), pc)
        if train:
            out, _ = m.apply(vars_, pc, mutable=["batch_stats"])
        else:
            out = m.apply(vars_, pc)
        return np.asarray(out, np.float32)

    def test_eval_forward_matches_standard_path(self):
        """Matmul-before-interpolate FP evaluation (fp_precompute_first)
        vs the standard path: Dense_0(interp(known)) ==
        interp(Dense_0(known)) up to f32 dot reassociation."""
        np.testing.assert_allclose(self._run(True), self._run(False),
                                   rtol=1e-5, atol=1e-5)

    def test_eval_matches_under_pallas_interp(self):
        # The restructure feeds the fused 3-NN kernel W0 channels
        # instead of C_known — results must agree with the standard
        # pallas path too.
        np.testing.assert_allclose(self._run(True, query_mode="pallas"),
                                   self._run(False, query_mode="pallas"),
                                   rtol=1e-5, atol=1e-5)

    def test_train_mode_ignores_flag(self):
        """Training keeps the standard path (mirrors the SA restructure's
        batch-stat constraint): the flag must not change train outputs."""
        np.testing.assert_array_equal(self._run(True, train=True),
                                      self._run(False, train=True))

    def test_bf16_path_within_rounding(self):
        np.testing.assert_allclose(self._run(True, dtype=jnp.bfloat16),
                                   self._run(False, dtype=jnp.bfloat16),
                                   atol=6e-3)


class TestHeadSplitGlobal:
    """Eval-only split of the heads' first Dense over the fusion concat
    (models/pvn3d.py::_SplitDense): the 1024 global-context kernel rows
    multiply one per-frame vector instead of N broadcast copies."""

    def _run(self, flag, dtype="float32", train=False):
        import dataclasses
        from pvn3d_tpu.models import PVN3D
        cfg = dataclasses.replace(small_config(), head_split_global=flag,
                                  compute_dtype=dtype)
        model = PVN3D(cfg=cfg, train=train, sparse_cnn=False)
        b, n = 2, cfg.n_sample_points
        pcld = jax.random.normal(jax.random.PRNGKey(0), (b, n, 9)) * 0.3
        rgb = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 3))
        choose = jax.random.randint(jax.random.PRNGKey(2), (b, n),
                                    0, 64 * 64)
        vars_ = model.init(jax.random.PRNGKey(3), pcld, rgb, choose)
        if train:
            out, _ = model.apply(vars_, pcld, rgb, choose,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(9)})
        else:
            out = model.apply(vars_, pcld, rgb, choose)
        return {k: np.asarray(v, np.float32) for k, v in out.items()
                if v is not None}, vars_

    def test_param_tree_identical(self):
        a, va = self._run(False)
        b, vb = self._run(True)
        ta = jax.tree_util.tree_structure(va)
        tb = jax.tree_util.tree_structure(vb)
        assert ta == tb

    def test_eval_forward_matches_standard_path(self):
        off, _ = self._run(False)
        on, _ = self._run(True)
        for k in off:
            np.testing.assert_allclose(on[k], off[k], rtol=2e-5, atol=2e-5)

    def test_bf16_within_rounding(self):
        off, _ = self._run(False, dtype="bfloat16")
        on, _ = self._run(True, dtype="bfloat16")
        for k in off:
            np.testing.assert_allclose(on[k], off[k], atol=8e-2, rtol=2e-2)

    def test_train_mode_ignores_flag(self):
        off, _ = self._run(False, train=True)
        on, _ = self._run(True, train=True)
        for k in off:
            np.testing.assert_array_equal(on[k], off[k])


def test_query_mode_auto_is_phase_aware():
    """auto = approx while TRAINING on TPU, pallas (downstream auto) at
    eval; explicit modes pass through (r4 accuracy A/B, pointnet2.py)."""
    from pvn3d_tpu.models.pointnet2 import resolve_query_mode
    assert resolve_query_mode("auto", True, "tpu") == "approx"
    assert resolve_query_mode("auto", False, "tpu") == "auto"
    assert resolve_query_mode("auto", True, "cpu") == "auto"
    for mode in ("exact", "approx", "pallas"):
        for train in (True, False):
            assert resolve_query_mode(mode, train, "tpu") == mode


class TestPhaseFoldedLayer1:
    """Eval-only 2x2 phase-folded layer1 (models/resnet.py::fold2/
    _phase_kernel3/BasicBlock.phase2): exactly the reference multiply-adds
    regrouped for full-lane channels."""

    def test_phase_kernel3_equals_full_space_conv(self):
        from pvn3d_tpu.models.resnet import _phase_kernel3, fold2, unfold2
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 10, 5).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
        y_full = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y_phase = unfold2(jax.lax.conv_general_dilated(
            fold2(x), _phase_kernel3(k), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        np.testing.assert_allclose(np.asarray(y_phase), np.asarray(y_full),
                                   atol=1e-4)

    def test_fold_unfold_roundtrip(self):
        from pvn3d_tpu.models.resnet import fold2, unfold2
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(3, 6, 8, 5).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(unfold2(fold2(x))),
                                      np.asarray(x))

    def test_trunk_phase_layer1_matches_standard(self):
        from pvn3d_tpu.models.resnet import DilatedResNet
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        base = DilatedResNet(layers=(2, 2, 2, 2), train=False,
                             dtype=jnp.float32, phase_layer1=False)
        variables = base.init(jax.random.PRNGKey(0), x)
        # Randomize BN running stats so the phase-space tiled-BN path is
        # actually exercised (init stats are the 0/1 identity).
        stats = jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                0.5 + 0.3 * np.random.RandomState(a.size).rand(
                    *a.shape).astype(np.float32)),
            variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": stats}
        y0 = base.apply(variables, x)
        y1 = DilatedResNet(layers=(2, 2, 2, 2), train=False,
                           dtype=jnp.float32,
                           phase_layer1=True).apply(variables, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=2e-4, rtol=1e-4)

    def test_phase_entry_kernel3_equals_strided_conv(self):
        from pvn3d_tpu.models.resnet import _phase_entry_kernel3, fold2
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 12, 8, 5).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
        y_full = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y_phase = jax.lax.conv_general_dilated(
            fold2(x), _phase_entry_kernel3(k), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(y_phase), np.asarray(y_full),
                                   atol=1e-4)

    def test_phase_zero_slice_is_strided_identity(self):
        from pvn3d_tpu.models.resnet import fold2
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 6, 8, 3).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(fold2(x)[..., :3]), np.asarray(x[:, ::2, ::2, :]))
