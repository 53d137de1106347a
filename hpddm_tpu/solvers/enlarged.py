"""Enlarged Krylov subspace methods.

Re-design of the reference's enlarged-Krylov preprocessing
(HPDDM_iterative.hpp:735-853 and the Subdomain specialization,
HPDDM_subdomain.hpp:661-750): a single right-hand side is split into
``k`` column-disjoint slices (by subdomain groups here, by contiguous
index blocks in the reference), the system is solved with a *block*
method over the k slices, and the partial solutions are summed.

The slices are made consistent with one scaled exchange each:
slice_j = exchange(D * f * 1_{group j}) so that sum_j slice_j = f for a
consistent f.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hpddm_tpu.parallel.decomposition import Decomposition
from hpddm_tpu.parallel.ops import scaled_exchange


def preprocess(dec: Decomposition, f: jax.Array, k: int,
               axis_name: Optional[str] = None) -> jax.Array:
    """Split a consistent single RHS (S, n, 1) into k slices (S, n, k)."""
    S = f.shape[0]
    group = (jnp.arange(S) * k) // S                        # (S,)
    ind = (group[:, None] == jnp.arange(k)[None, :])        # (S, k)
    slices = f * ind[:, None, :].astype(f.dtype)            # (S, n, k)
    return scaled_exchange(dec, slices, axis_name)


def equilibrate(slices: jax.Array) -> jax.Array:
    """Scale slices to comparable norms (HPDDM_iterative.hpp equilibrate)."""
    norms = jnp.sqrt(jnp.sum(jnp.abs(slices) ** 2, axis=(0, 1),
                             keepdims=True))
    return slices / jnp.where(norms > 0, norms, 1.0)


def postprocess(x_slices: jax.Array, scale: Optional[jax.Array] = None) -> jax.Array:
    """Recombine: x = sum_j x_j -> (S, n, 1)."""
    if scale is not None:
        x_slices = x_slices * scale
    return jnp.sum(x_slices, axis=-1, keepdims=True)
