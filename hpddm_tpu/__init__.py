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


def _enable_persistent_compile_cache():
    """Point jax at a persistent on-disk compilation cache by default.

    Setup at flagship scale is dominated by one-time compiles (the Lanczos
    GEVP scan, banded solves) routed through a remote compile server on
    this runtime — minutes cold, milliseconds from the cache (measured
    1.74 s -> 0.25 s across *processes* on a small probe; the reference
    counts numfact as a benchmarked hot path, benchmark/local_solver.cpp).
    Honors an existing jax setting; HPDDM_TPU_COMPILE_CACHE overrides the
    location, =0 disables."""
    import os

    loc = os.environ.get("HPDDM_TPU_COMPILE_CACHE")
    if loc == "0":
        return
    import jax

    if jax.config.jax_compilation_cache_dir or \
            os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return                      # user already configured one
    if not loc:
        loc = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".cache", "xla")
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
