"""Persistent-cache hygiene: the XLA cache directory is keyed by a machine
fingerprint so XLA:CPU AOT artifacts compiled on one machine class are never
replayed on another (SIGILL risk — jax's own cache key covers the backend
platform but not host CPU features)."""

import jax

import hpddm_tpu
from hpddm_tpu import _machine_fingerprint


def test_fingerprint_deterministic():
    assert _machine_fingerprint() == _machine_fingerprint()
    assert len(_machine_fingerprint()) == 12


def test_fingerprint_keys_on_cpu_flags():
    a = _machine_fingerprint(flags="avx2 avx512f fma")
    b = _machine_fingerprint(flags="avx2 fma")
    assert a != b
    # flag order must not matter (kernels list them in arbitrary order)
    assert a == _machine_fingerprint(flags="fma avx512f avx2")


def test_cache_disabled_on_cpu_backend():
    # The test suite runs on the CPU backend (conftest): hpddm_tpu must NOT
    # have pointed jax at a persistent cache there — XLA:CPU entries are
    # host-specific AOT code (SIGILL risk cross-machine, error-log noise
    # even same-machine).
    import os
    if os.environ.get("HPDDM_TPU_COMPILE_CACHE") or \
            os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user opted in explicitly
    assert jax.default_backend() == "cpu"
    loc = jax.config.jax_compilation_cache_dir
    assert not loc, loc


def test_cache_location_policy():
    from hpddm_tpu import _cache_location
    # CPU backend: no cache (AOT noise / SIGILL risk, see module docstring)
    assert _cache_location("cpu", None) is None
    assert _cache_location("cpu,tpu", None) is None
    # accelerator backends: machine-fingerprinted directory
    for plat in ("axon", "tpu", ""):
        loc = _cache_location(plat, None)
        assert loc is not None and \
            loc.rstrip("/").endswith(_machine_fingerprint()), (plat, loc)
    # explicit override always wins; "0" disables
    assert _cache_location("cpu", "/tmp/x") == "/tmp/x"
    assert _cache_location("axon", "0") is None
