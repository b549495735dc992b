"""Multi-host (pod) utilities: process bootstrap + global batch assembly.

The reference is strictly single-machine (SURVEY §2.3: DataParallel only).
Here multi-host runs are first-class: each host feeds its local shard of
the global batch and `jax.make_array_from_process_local_data` assembles the
logically-global sharded arrays the jitted step consumes.
"""
from __future__ import annotations

from typing import Mapping, Optional

import jax
import numpy as np

from pvn3d_tpu.parallel.mesh import batch_sharding


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap (no-op when already initialized).

    With explicit coordinator args a real bootstrap is demanded — errors
    propagate.  With no args (the single-machine `--distributed` fast
    path), the absence of any cluster environment is tolerated and the
    run continues single-process: jax raises ValueError("coordinator_
    address should be defined") when no cluster auto-detect succeeds
    (RuntimeError also accepted for older jax).
    """
    if jax.distributed.is_initialized():
        return
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # no cluster auto-detect environment: stay single-process


def process_local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n


def global_batch_from_local(mesh, local_batch: Mapping[str, np.ndarray]
                            ) -> dict:
    """Assemble per-host numpy shards into global sharded jax.Arrays.

    Each host passes its own ``local_batch`` (its rows of the global
    batch); the result is addressable-shard-backed global arrays laid out
    by the same per-field specs `shard_batch` uses.
    """
    sh = batch_sharding(mesh, local_batch)
    return {
        k: jax.make_array_from_process_local_data(sh[k], np.asarray(v))
        for k, v in local_batch.items()
    }
