"""hpddm_tpu — a TPU-native domain-decomposition sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HPDDM
(https://github.com/hpddm/hpddm, reference layout catalogued in SURVEY.md):

* one- and two-level overlapping Schwarz preconditioners (RAS / ASM / ORAS /
  SORAS) with GenEO spectral coarse spaces,
* FETI and BDD substructuring,
* a Krylov suite — GMRES / Block GMRES, CG / Block CG / Breakdown-Free Block
  CG, GCRO-DR / Block GCRO-DR, Richardson — with left / right / flexible
  preconditioning and multiple simultaneous right-hand sides.

Design stance (not a port):

* a *subdomain* is one slice of a batched array; subdomains are sharded
  one-per-chip over a ``jax.sharding.Mesh`` axis (``shard_map``),
* MPI point-to-point halo exchange becomes an interface scatter-add +
  ``lax.psum`` (or ``ppermute`` rings) over ICI,
* the per-subdomain direct solves that HPDDM delegates to
  MUMPS/PARDISO/SuiteSparse become batched dense/block factorizations on the
  MXU,
* local sparse matrices use TPU-regular formats (DIA for stencils, padded
  ELL otherwise) instead of CSR,
* ARPACK shift-invert GenEO eigenproblems become batched shift-invert
  Lanczos in pure JAX,
* the coarse operator E = Zᵀ A Z is assembled with all-gathers and solved
  replicated (optionally in lower precision, mirroring
  ``HPDDM_MIXED_PRECISION``).
"""

__version__ = "0.1.0"


def _machine_fingerprint(flags=None):
    """Short hash identifying this host's ISA surface (+ jaxlib version).

    XLA:CPU persistent-cache entries embed AOT machine code compiled for the
    *compiling* host's CPU features; jax's cache key covers the backend
    platform but not those features, so a cache directory shared between
    machines can replay AOT code the executing CPU cannot run (SIGILL risk).
    Keying the directory by a fingerprint of the CPU feature flags makes each
    machine class use its own entries."""
    import hashlib
    import platform

    parts = [platform.machine()]
    if flags is not None:             # injectable for tests
        parts.append(" ".join(sorted(flags.split())))
    else:
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        parts.append(
                            " ".join(sorted(line.split(":", 1)[1].split())))
                        break
        except OSError:
            parts.append(platform.processor())
    try:
        import jaxlib
        parts.append(jaxlib.__version__)
    except Exception:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def _cache_location(platforms, override):
    """Resolve the persistent-cache directory, or None to leave it off.

    ``platforms``: first entry of jax_platforms (resolved platform request);
    ``override``: HPDDM_TPU_COMPILE_CACHE env value (path, "0", or None).

    CPU is cache-less unless explicitly overridden: XLA:CPU cache entries
    are AOT machine code, and the loader error-logs a feature-string
    mismatch on *every* load (the +prefer-no-scatter/gather tuning prefs
    are compared as if they were host CPU features) — all risk/noise,
    little win, since CPU compiles are local and fast. The cache's purpose
    here is the remote axon/TPU compile server (minutes cold)."""
    import os

    if override == "0":
        return None
    if override:
        return override
    if (platforms or "").split(",")[0] == "cpu":
        return None
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "xla",
        _machine_fingerprint())


def _enable_persistent_compile_cache():
    """Point jax at a persistent on-disk compilation cache by default.

    Setup at flagship scale is dominated by one-time compiles (the Lanczos
    GEVP scan, banded solves) routed through a remote compile server on
    this runtime — minutes cold, milliseconds from the cache (measured
    1.74 s -> 0.25 s across *processes* on a small probe; the reference
    counts numfact as a benchmarked hot path, benchmark/local_solver.cpp).
    The directory is keyed by a machine fingerprint (see
    ``_machine_fingerprint``) so AOT artifacts never cross machine classes;
    the CPU backend gets no cache at all (see ``_cache_location``).
    Honors an existing jax setting; HPDDM_TPU_COMPILE_CACHE overrides the
    location, =0 disables."""
    import os

    import jax

    if jax.config.jax_compilation_cache_dir or \
            os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return                      # user already configured one
    platforms = jax.config.jax_platforms or \
        os.environ.get("JAX_PLATFORMS") or ""
    loc = _cache_location(platforms, os.environ.get("HPDDM_TPU_COMPILE_CACHE"))
    if not loc:
        return
    try:
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
    except OSError:
        pass                        # read-only installs: just skip


_enable_persistent_compile_cache()

from hpddm_tpu.options import Options
from hpddm_tpu.core.csr import MatrixCSR
from hpddm_tpu.parallel.decomposition import Decomposition
from hpddm_tpu.precond.schwarz import Schwarz
from hpddm_tpu.solvers.krylov import solve

__all__ = [
    "Options",
    "MatrixCSR",
    "Decomposition",
    "Schwarz",
    "solve",
    "__version__",
]
