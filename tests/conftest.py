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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled XLA:CPU executables at module boundaries.

    XLA:CPU segfaults inside backend_compile_and_load once enough live
    executables accumulate in one process (VERDICT r3 weak #2: two
    independent full-suite runs died at the identical 216th test; the
    same file passes in isolation). Dropping the compilation caches per
    module keeps the live-executable count bounded so `pytest tests/ -q`
    holds in a single process; cross-module cache reuse was negligible
    (different shapes/configs per module)."""
    yield
    jax.clear_caches()
