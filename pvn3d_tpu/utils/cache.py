"""Persistent XLA compilation cache.

Full-model compiles take minutes through the remote-TPU tunnel (autotuning
round-trips); the persistent cache makes every recompile of an unchanged
program near-instant.  Called by the CLIs, bench.py and the driver entry.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/pvn3d_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> str:
    import jax
    path = path or os.environ.get("PVN3D_XLA_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
