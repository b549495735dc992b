"""--platform plumbing shared by every CLI and benchmark.

This image pre-registers a remote TPU backend ("axon") that wins over the
``JAX_PLATFORMS`` env var, and the first device access blocks
indefinitely when the tunnel is down.  CLIs therefore take ``--platform``
(e.g. ``cpu``) and call :func:`apply_platform` BEFORE any jax device
access; ``--cpu_devices N`` additionally forces N virtual host devices
(for mesh plumbing checks without hardware).
"""
from __future__ import annotations

import os


def add_platform_args(parser) -> None:
    parser.add_argument(
        "--platform", default="",
        help="force a jax backend (e.g. 'cpu') — the env var alone "
             "cannot override this image's pre-registered remote TPU "
             "backend, and device access hangs when its tunnel is down")
    parser.add_argument(
        "--cpu_devices", type=int, default=0,
        help="with --platform cpu: number of virtual host devices "
             "(xla_force_host_platform_device_count)")


def apply_platform(args) -> None:
    """Apply --platform/--cpu_devices.  Must run before jax device use."""
    n = getattr(args, "cpu_devices", 0)
    if n:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
    if getattr(args, "platform", ""):
        import jax
        jax.config.update("jax_platforms", args.platform)
