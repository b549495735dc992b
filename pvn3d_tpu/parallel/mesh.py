"""Device-mesh construction and sharding specs.

The reference's entire distribution story is single-process
``nn.DataParallel`` scatter/gather plus a vendored thread-rendezvous SyncBN
(reference: pvn3d/train/train_ycb_pvn3d.py:467, lib/utils/sync_batchnorm/).
Here distribution is a single GSPMD program over a named mesh:

  * ``dp``  — data parallel over frames.  Gradients all-reduce over ICI via
    the psum XLA inserts for the sharded batch; BatchNorm statistics are
    global automatically because the batch-axis ``jnp.mean`` inside the
    jitted step reduces over the whole sharded axis (SyncBN for free).
  * ``sp``  — intra-frame point-dimension sharding for the per-point
    fusion/head stage and the batched vote-clustering problems (the analog
    of sequence parallelism; the model has no attention).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
feed per-host shards through ``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(dp: Optional[int] = None, sp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('dp', 'sp') mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp}*{sp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


# Per-field batch partition specs: frames shard over dp; the point axis of
# per-point tensors shards over sp (pointwise heads and vote clustering are
# embarrassingly parallel over points; SA/FP stages gather what they need).
_BATCH_SPECS: Mapping[str, P] = {
    "pointcloud": P("dp", "sp"),
    "rgb": P("dp"),
    "choose": P("dp", "sp"),
    "labels": P("dp", "sp"),
    "kp_targ_ofst": P("dp", "sp"),
    "ctr_targ_ofst": P("dp", "sp"),
    "cls_ids": P("dp"),
    "rts": P("dp"),
    "kp_3ds": P("dp"),
    "ctr_3ds": P("dp"),
}


def batch_spec(batch: Mapping[str, Any]) -> Mapping[str, P]:
    return {k: _BATCH_SPECS.get(k, P("dp")) for k in batch}


def batch_sharding(mesh: Mesh, batch: Mapping[str, Any]):
    return {k: NamedSharding(mesh, s) for k, s in batch_spec(batch).items()}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Mapping[str, Any]):
    """Device-put a host batch dict onto the mesh with per-field specs."""
    sh = batch_sharding(mesh, batch)
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
