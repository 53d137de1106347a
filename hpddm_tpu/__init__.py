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
