"""Worker process for the N=2 jax.distributed CPU test (test_multihost.py).

Each process owns 2 virtual CPU devices (4 global), bootstraps through
``initialize_distributed`` with a local coordinator, assembles its local
half of the global batch via ``global_batch_from_local``, and runs ONE
full (tiny-config) sharded train step.  Prints the loss so the parent can
assert both processes agree on the replicated result.

Usage: python tests/_multihost_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    pid, nproc, port = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_config
    from pvn3d_tpu.data.synthetic import synthetic_batch
    from pvn3d_tpu.parallel.mesh import make_mesh, replicated
    from pvn3d_tpu.parallel.multihost import (global_batch_from_local,
                                              initialize_distributed,
                                              process_local_batch_size)
    from pvn3d_tpu.train.state import create_train_state
    from pvn3d_tpu.train.step import make_train_step

    initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    mesh = make_mesh(dp=2 * nproc, sp=1)
    cfg = _tiny_config()
    global_bs = 2 * nproc
    local_bs = process_local_batch_size(global_bs)
    # Each process materializes the full global batch identically (same
    # seed), then feeds only its own rows — the multi-host data path.
    full = synthetic_batch(cfg, batch_size=global_bs,
                           n_points=cfg.model.n_sample_points,
                           height=64, width=64)
    lo = pid * local_bs
    local = {k: np.asarray(v)[lo:lo + local_bs] for k, v in full.items()}

    rng = jax.random.PRNGKey(0)
    state, model, tx = create_train_state(cfg, rng, local)
    train_step = make_train_step(cfg, model, tx)

    with mesh:
        rep = replicated(mesh)
        state_sh = jax.device_put(state, rep)
        batch_sh = global_batch_from_local(mesh, local)
        step_rng = jax.device_put(jax.random.PRNGKey(1), rep)
        new_state, metrics = jax.jit(train_step, donate_argnums=(0,))(
            state_sh, batch_sh, step_rng)
        loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    assert int(new_state.step) == 1
    print(f"proc{pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
