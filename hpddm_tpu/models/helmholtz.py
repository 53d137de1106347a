"""2D Helmholtz test problem with ORAS optimized interface conditions.

The reference's ORAS path factorizes a *user-supplied* optimized local
matrix instead of the plain restriction (``Schwarz::callNumfact`` with the
user matrix, HPDDM_schwarz.hpp:337-368); the classic choice for Helmholtz
is a zeroth-order (Robin) absorbing condition i*k on the artificial
interface. This model builds:

* local matrices A_s = (5-point Laplacian) - (k^2 + i*eps*k^2) I on the
  overlapping decomposition of models/diffusion2d (complex scalars — the
  reference templates over K in {complex<float>, complex<double>}),
* optimized ORAS matrices A_s + i*k*h * diag(artificial boundary),
  where the artificial boundary is exactly the zero set of the analytic
  POU (the outermost overlap layer).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

from hpddm_tpu.core.csr import MatrixCSR
from hpddm_tpu.models import diffusion2d


def generate(size_world: int, Nx: int = 100, Ny: int = 100,
             overlap: int = 1, k: float = 6.0, eps: float = 0.05,
             dtype=np.complex128):
    """Returns a Generated (diffusion2d layout) with complex matrices and
    an extra attribute ``oras_mats``."""
    gen = diffusion2d.generate(size_world, Nx, Ny, overlap=overlap,
                               dtype=np.float64)
    h = 10.0 / Nx
    shift = k * k * (1.0 + 1j * eps)
    oras_mats = []
    for s in range(size_world):
        A = gen.mats[s].scipy().astype(dtype)
        A = A - shift * sp.identity(A.shape[0], dtype=dtype, format="csr")
        gen.mats[s] = MatrixCSR(A)
        # Robin i*k on the artificial boundary (POU zero set); interior
        # subdomain edges only — the physical boundary keeps Dirichlet
        robin = (np.asarray(gen.d[s]) < 1e-12).astype(np.float64)
        Aop = A + 1j * k / h * sp.diags(robin).astype(dtype)
        oras_mats.append(MatrixCSR(sp.csr_matrix(Aop)))
        gen.f[s] = gen.f[s].astype(dtype)
    gen.oras_mats = oras_mats
    return gen
