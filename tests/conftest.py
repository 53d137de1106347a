"""Test configuration: force CPU with 8 virtual devices and enable x64.

Multi-chip sharding is validated on a virtual CPU mesh (the driver's
dryrun_multichip does the same); f64 is required for apples-to-apples
iteration-count comparisons with the reference oracles (SURVEY.md §6).

Note: the harness pre-imports jax (sitecustomize), so env vars alone do not
switch the platform — jax.config.update is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
