"""Multi-host batch assembly (single-process degenerate case on the CPU
mesh: local shard == global batch, laid out by the field specs)."""
import jax
import numpy as np

from pvn3d_tpu.parallel.mesh import make_mesh
from pvn3d_tpu.parallel.multihost import (global_batch_from_local,
                                          process_local_batch_size)


def test_process_local_batch_size():
    assert process_local_batch_size(24) == 24   # single process


def test_global_batch_from_local_shards_correctly():
    mesh = make_mesh(dp=4, sp=2)
    local = {
        "pointcloud": np.arange(4 * 8 * 9, dtype=np.float32
                                ).reshape(4, 8, 9),
        "rgb": np.ones((4, 6, 6, 3), np.float32),
        "labels": np.zeros((4, 8), np.int32),
    }
    out = global_batch_from_local(mesh, local)
    assert out["pointcloud"].shape == (4, 8, 9)
    # dp x sp sharding on (B, N): each addressable shard is (1, 4, 9).
    shard_shapes = {s.data.shape for s in out["pointcloud"].addressable_shards}
    assert shard_shapes == {(1, 4, 9)}
    np.testing.assert_allclose(np.asarray(out["pointcloud"]),
                               local["pointcloud"])
    assert {s.data.shape for s in out["rgb"].addressable_shards} == {
        (1, 6, 6, 3)}
