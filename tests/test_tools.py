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
    # Full shards split into 2s; the final 1-sample shard passes through.
    assert [len(b["y"]) for b in rebatched] == [2, 2, 2, 2, 1]
    first = batches[0]
    assert first["x"].shape == (4, 3)
    assert first["y"][0] == 0 and first["y"][3] == 3


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
