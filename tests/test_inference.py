"""Batched MeanShift + pose-from-votes pipeline tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvn3d_tpu.geometry.se3 import random_pose, transform_points
from pvn3d_tpu.inference.evaluator import PoseEvaluator, eval_frame_metrics
from pvn3d_tpu.inference.meanshift import mean_shift_fit
from pvn3d_tpu.inference.pose import cal_frame_poses


def np_meanshift_oracle(a, bw, max_iter=300):
    """Exact reference semantics (meanshift_pytorch.py:24-51)."""
    n = len(a)
    c = a.copy()
    it = 0
    while True:
        it += 1
        dis = np.linalg.norm(c[:, None, :] - a[None, :, :], axis=2)
        w = (1 / (bw * np.sqrt(2 * np.pi))) * np.exp(-0.5 * (dis / bw) ** 2)
        new_c = (w[..., None] * a[None]).sum(1) / w.sum(1, keepdims=True)
        shift = np.linalg.norm(new_c - c, axis=1)
        c = new_c
        if shift.max() < bw * 1e-3 or it > max_iter:
            break
    dis0 = np.linalg.norm(a[:, None] - a[None, :], axis=2)
    num_in = (dis0 < bw).sum(1)
    win = num_in.argmax()
    return c[win], dis0[win] < bw, num_in[win]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_meanshift_matches_reference_oracle(seed):
    rng = np.random.RandomState(seed)
    # Two gaussian blobs; the denser one must win.
    a = np.concatenate([
        rng.normal([0.0, 0.0, 1.0], 0.02, (60, 3)),
        rng.normal([0.3, 0.2, 1.1], 0.02, (30, 3)),
    ]).astype(np.float32)
    bw = 0.08
    oc, ol, on = np_meanshift_oracle(a, bw)
    centers, labels, counts = mean_shift_fit(
        a[None], np.ones((1, len(a)), bool), bw)
    np.testing.assert_allclose(np.asarray(centers[0]), oc, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(labels[0]), ol)
    assert int(counts[0]) == int(on)


def test_meanshift_masking_matches_unpadded():
    rng = np.random.RandomState(3)
    a = rng.normal([0, 0, 1], 0.03, (50, 3)).astype(np.float32)
    pad = np.full((30, 3), 77.0, np.float32)      # far-away pad points
    padded = np.concatenate([a, pad])[None]
    mask = np.concatenate([np.ones(50, bool), np.zeros(30, bool)])[None]
    oc, ol, on = np_meanshift_oracle(a, 0.08)
    centers, labels, counts = mean_shift_fit(padded, mask, 0.08)
    np.testing.assert_allclose(np.asarray(centers[0]), oc, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(labels[0, :50]), ol)
    assert not labels[0, 50:].any()
    assert int(counts[0]) == int(on)


def _frame_from_pose(rng, mesh_kps_full, pose, n=256, noise=0.0):
    """Synthesize a frame voting exactly (or noisily) for `pose`."""
    n_kps = mesh_kps_full.shape[0] - 1
    kps_cam = np.asarray(transform_points(pose, mesh_kps_full))  # (9, 3)
    pcld = rng.normal(kps_cam[-1], 0.05, (n, 3)).astype(np.float32)
    mask = np.ones(n, np.int32)
    kp_of = (pcld[None] - kps_cam[:n_kps, None, :]).astype(np.float32)
    ctr_of = (pcld[None] - kps_cam[-1][None, None, :]).astype(np.float32)
    if noise:
        kp_of += rng.normal(0, noise, kp_of.shape).astype(np.float32)
        ctr_of += rng.normal(0, noise, ctr_of.shape).astype(np.float32)
    return pcld, mask, ctr_of, kp_of


def _toy_mesh_kps(rng, n_cls=3, n_kps=8):
    kps = rng.uniform(-0.06, 0.06, (n_cls, n_kps, 3)).astype(np.float32)
    ctr = kps.mean(axis=1, keepdims=True)
    out = np.concatenate([kps, ctr], axis=1)
    out[0] = 0
    return out


@pytest.mark.parametrize("refine", [False, True])
def test_pose_recovery_exact_votes(refine):
    rng = np.random.RandomState(0)
    mesh_kps = _toy_mesh_kps(rng)
    pose = np.array(random_pose(jax.random.PRNGKey(7), max_trans=0.3))
    pose[..., 2, 3] += 1.0
    pcld, mask, ctr_of, kp_of = _frame_from_pose(rng, mesh_kps[1], pose)
    radii = np.ones(3, np.float32) * 0.3
    out = cal_frame_poses(pcld, mask, ctr_of, kp_of, mesh_kps, radii,
                          n_cls=3, n_kps=8, k=128, refine_mask=refine)
    assert bool(out.present[1]) and not bool(out.present[2])
    np.testing.assert_allclose(np.asarray(out.poses[1]), pose, atol=1e-3)
    # Absent class -> zero pose (eval_metric gather semantics).
    np.testing.assert_array_equal(np.asarray(out.poses[2]), 0.0)


def test_pose_recovery_noisy_votes_and_metrics():
    rng = np.random.RandomState(1)
    mesh_kps = _toy_mesh_kps(rng)
    pose = np.array(random_pose(jax.random.PRNGKey(3), max_trans=0.2))
    pose[..., 2, 3] += 1.0
    pcld, mask, ctr_of, kp_of = _frame_from_pose(
        rng, mesh_kps[1], pose, n=300, noise=0.004)
    radii = np.ones(3, np.float32) * 0.3
    out = cal_frame_poses(pcld, mask, ctr_of, kp_of, mesh_kps, radii,
                          n_cls=3, n_kps=8, k=256)

    mesh_pts = rng.uniform(-0.05, 0.05, (3, 64, 3)).astype(np.float32)
    mesh_valid = np.ones((3, 64), bool)
    gt_cls = np.array([1, 0], np.int32)
    gt_rts = np.stack([pose, np.eye(3, 4, dtype=np.float32)])
    add, adds = eval_frame_metrics(out.poses, gt_cls, gt_rts,
                                   mesh_pts, mesh_valid)
    assert float(add[0]) < 0.01
    assert float(adds[0]) <= float(add[0]) + 1e-6

    ev = PoseEvaluator(n_cls=3, sym_cls_ids=(), ds_type="toy")
    ev.add_frame(gt_cls, np.asarray(add), np.asarray(adds))
    s = ev.summarize()
    assert s["per_class"][1]["add_auc"] > 90.0
    assert s["per_class"][1]["n"] == 1 and s["per_class"][2]["n"] == 0


def test_evaluator_auc_protocol():
    # Distances of 0 -> AUC 100; > 0.1 m -> AUC 0 (VOCap, max_dis=0.1).
    ev = PoseEvaluator(n_cls=3, sym_cls_ids=(2,), ds_type="toy")
    for _ in range(10):
        ev.add_frame([1], [0.0], [0.0])
        ev.add_frame([2], [0.5], [0.001])
    s = ev.summarize()
    assert s["per_class"][1]["add_auc"] > 99.0
    assert s["per_class"][2]["add_auc"] == 0.0
    # Symmetric class 2 uses ADD-S for the ADD(-S) column.
    assert s["per_class"][2]["add_s_auc"] > 90.0


def test_meanshift_winner_matches_dense_mode():
    rng = np.random.RandomState(7)
    pts = np.concatenate([
        rng.normal([0, 0, 1], 0.02, (40, 3)),
        rng.normal([0.4, 0.1, 1.2], 0.03, (25, 3)),
        rng.uniform(-0.5, 0.5, (15, 3)) + [0, 0, 1],
    ]).astype(np.float32)[None]
    mask = np.ones((1, 80), bool)
    cw, lw, nw = mean_shift_fit(pts, mask, 0.08, mode="winner")
    cd, ld, nd = mean_shift_fit(pts, mask, 0.08, mode="dense")
    # Winner selection/labels identical; modes agree to ~stop-threshold.
    np.testing.assert_array_equal(np.asarray(lw), np.asarray(ld))
    assert int(nw[0]) == int(nd[0])
    np.testing.assert_allclose(np.asarray(cw), np.asarray(cd), atol=5e-4)


def test_select_class_points_rank_oracle():
    """Sort-free selection == the p-th class point in index order, with the
    even-stride positions pos_j = floor(j*count/k) when count > k."""
    from pvn3d_tpu.inference.pose import _select_class_points
    rng = np.random.RandomState(3)
    n, n_cls, k = 600, 5, 32
    mask = rng.randint(0, n_cls, n).astype(np.int32)
    mask[mask == 3] = 0                      # absent class
    mask[:200][mask[:200] == 4] = 2          # one class > k points
    sel, valid, count = map(np.asarray,
                            _select_class_points(jnp.asarray(mask), n_cls, k))
    for ci, c in enumerate(range(1, n_cls)):
        where = np.where(mask == c)[0]
        cnt = len(where)
        assert count[ci] == cnt
        m = min(cnt, k)
        assert valid[ci, :m].all() and not valid[ci, m:].any()
        if cnt > k:
            pos = (np.arange(k) * cnt) // k
            np.testing.assert_array_equal(sel[ci], where[pos])
        else:
            np.testing.assert_array_equal(sel[ci, :m], where)
