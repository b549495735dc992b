from pvn3d_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, batch_spec, replicated, shard_batch,
    local_device_count,
)
