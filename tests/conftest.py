"""Test configuration: force an 8-device virtual CPU platform.

All sharding/collective logic is exercised on a virtual mesh
(``--xla_force_host_platform_device_count=8``) so tests never need real TPU
chips.  This environment pre-registers a remote TPU backend via
sitecustomize, so ``JAX_PLATFORMS=cpu`` alone is not enough — we must also
override through jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
