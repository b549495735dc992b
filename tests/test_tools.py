"""Packing tool + profiling utilities."""
import numpy as np

from pvn3d_tpu.tools.preprocess_testset import (iter_packed_batches,
                                                pack_dataset)
from pvn3d_tpu.utils.profiling import StepTimer, device_loop_time


class _DS:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        if i == 4:
            return None
        return {"x": np.full((3,), float(i), np.float32),
                "y": np.int32(i)}


def test_pack_and_iter_roundtrip(tmp_path):
    out = str(tmp_path / "packed")
    n = pack_dataset(_DS(), out, shard_size=4)
    assert n == 9
    batches = list(iter_packed_batches(out))
    assert sum(len(b["y"]) for b in batches) == 9
    rebatched = list(iter_packed_batches(out, batch_size=2))
    # Remainders carry across shards; the final partial batch is padded
    # (repeat-last) and tagged with the real count.
    assert [len(b["y"]) for b in rebatched] == [2, 2, 2, 2, 2]
    assert rebatched[-1]["_n_valid"] == 1
    assert all("_n_valid" not in b for b in rebatched[:-1])
    real = np.concatenate([b["y"][:b.get("_n_valid", len(b["y"]))]
                           for b in rebatched])
    assert sorted(real.tolist()) == [0, 1, 2, 3, 5, 6, 7, 8, 9]
    first = batches[0]
    assert first["x"].shape == (4, 3)
    assert first["y"][0] == 0 and first["y"][3] == 3


def test_iter_packed_batches_carries_across_shards(tmp_path):
    # shard_size 4 with batch 3: 4 % 3 remainders must flow into the next
    # shard, not be dropped (9 frames -> 3 full batches, no padding).
    out = str(tmp_path / "packed3")
    pack_dataset(_DS(), out, shard_size=4)
    batches = list(iter_packed_batches(out, batch_size=3))
    assert [len(b["y"]) for b in batches] == [3, 3, 3]
    assert all("_n_valid" not in b for b in batches)
    seen = sorted(np.concatenate([b["y"] for b in batches]).tolist())
    assert seen == [0, 1, 2, 3, 5, 6, 7, 8, 9]


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    s = t.stats()
    assert s["n"] == 3 and s["mean_s"] >= 0


def test_device_loop_time_runs():
    import jax.numpy as jnp
    dt = device_loop_time(lambda i: i * 2.0, iters=4)
    assert dt >= 0


def test_validate_frame_catches_bad_offsets():
    from pvn3d_tpu.tools.check_dataset import validate_frame
    n = 64
    cld = np.random.RandomState(0).rand(n, 3).astype(np.float32)
    labels = np.zeros(n, np.int32)
    labels[:20] = 1
    kp3 = np.random.RandomState(1).rand(8, 3).astype(np.float32)
    ctr3 = kp3.mean(0)
    kp_t = np.zeros((n, 8, 3), np.float32)
    ctr_t = np.zeros((n, 1, 3), np.float32)
    kp_t[:20] = cld[:20, None, :] - kp3[None]
    ctr_t[:20, 0] = cld[:20] - ctr3[None]
    sample = {
        "pointcloud": np.concatenate(
            [cld, np.zeros((n, 6), np.float32)], axis=1),
        "labels": labels,
        "kp_targ_ofst": kp_t, "ctr_targ_ofst": ctr_t,
        "cls_ids": np.array([1, 0]),
        "rts": np.zeros((2, 3, 4), np.float32),
        "kp_3ds": np.stack([kp3, np.zeros_like(kp3)]),
        "ctr_3ds": np.stack([ctr3, np.zeros(3, np.float32)]),
    }
    assert validate_frame(sample) == []
    # Corrupt a keypoint offset -> caught.
    bad = dict(sample)
    bad["kp_targ_ofst"] = kp_t.copy()
    bad["kp_targ_ofst"][5, 2] += 0.01
    assert any("kp offsets" in e for e in validate_frame(bad))
    # Offsets on background -> caught.
    bad2 = dict(sample)
    bad2["kp_targ_ofst"] = kp_t.copy()
    bad2["kp_targ_ofst"][40] = 1.0
    assert any("background" in e for e in validate_frame(bad2))


def test_fake_linemod_generator_feeds_dataset(tmp_path):
    from pvn3d_tpu.data.frame import FrameSpec
    from pvn3d_tpu.data.linemod import LineMODDataset
    from pvn3d_tpu.tools.fake_data import make_fake_linemod
    root = make_fake_linemod(str(tmp_path), n_frames=3)
    ds = LineMODDataset(root, cls_type="ape", split="test",
                        spec=FrameSpec(n_sample_points=1024))
    s = ds[0]
    assert s is not None and s["pointcloud"].shape == (1024, 9)
    from pvn3d_tpu.tools.check_dataset import validate_frame
    assert validate_frame(s) == []


def test_seed_ladder_summary_and_resume_filter(tmp_path):
    import json
    from benchmarks.seed_ladder import _summary
    runs = [
        {"arm": "approx", "seed": 1, "ok": True, "add_auc": 30.0,
         "eval_seg_acc": 0.84, "icp": {"delta_add_auc": -1.0}},
        {"arm": "approx", "seed": 2, "ok": True, "add_auc": 34.0,
         "eval_seg_acc": 0.86, "icp": {"delta_add_auc": 2.0}},
        {"arm": "pallas", "seed": 1, "ok": False},   # failed run: excluded
    ]
    s = _summary(runs)
    assert s["approx"]["n"] == 2
    assert s["approx"]["add_auc_mean"] == 32.0
    assert s["approx"]["icp_delta_add_auc_mean"] == 0.5
    assert "pallas" not in s
    # The resume filter keeps only ok runs from a prior --out file.
    out = tmp_path / "ladder.json"
    out.write_text(json.dumps({"runs": runs}))
    kept = [r for r in json.loads(out.read_text())["runs"] if r.get("ok")]
    assert {(r["arm"], r["seed"]) for r in kept} == {("approx", 1),
                                                     ("approx", 2)}
