"""Operator protocol for the Krylov layer.

The reference's Krylov methods are templated on an ``Operator`` exposing
``GMV`` (global SpMV), ``apply`` (preconditioner), and a POU scaling used to
weight all inner products (``EmptyOperator``/``CustomOperator``,
include/HPDDM_iterative.hpp:49-90). Here an operator is a tiny Python object
holding jit-friendly closures; solvers close over it, so only arrays are
traced.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hpddm_tpu.dtypes import conj
from hpddm_tpu.parallel.ops import psum_if


class LinearOperator:
    """Bundle of (gmv, apply, weighted reductions) closures.

    x layout: (S, n, mu) — a batch of subdomains times multiple RHS. For a
    non-decomposed operator use S = 1.

    weight: (S, n) partition of unity for inner products, or None for plain
    dots (single-domain / substructuring custom weights).
    """

    def __init__(self,
                 gmv: Callable[[jax.Array], jax.Array],
                 apply: Optional[Callable[[jax.Array], jax.Array]] = None,
                 weight: Optional[jax.Array] = None,
                 axis_name: Optional[str] = None,
                 norm_filter: Optional[Callable[[jax.Array],
                                                jax.Array]] = None):
        self.gmv = gmv
        self.apply = apply if apply is not None else (lambda x: x)
        self.weight = weight
        self.axis_name = axis_name
        self.has_prec = apply is not None
        # optional filter applied to b before the convergence reference
        # norm (IterativeMethod::initializeNorm downscales Dirichlet-
        # penalty entries by HPDDM_PEN, HPDDM_iterative.hpp:455-470)
        self.norm_filter = norm_filter

    def init_norm_sq(self, b: jax.Array) -> jax.Array:
        """Convergence-reference squared norm of b (penalty-filtered)."""
        if self.norm_filter is not None:
            b = self.norm_filter(b)
        return self.norm_sq(b)

    # -- weighted reductions (the per-iteration collectives) --------------
    def dot(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Global per-RHS dot -> (mu,)."""
        if self.weight is not None:
            local = jnp.sum(self.weight[:, :, None] * conj(x) * y, axis=(0, 1))
        else:
            local = jnp.sum(conj(x) * y, axis=(0, 1))
        return psum_if(local, self.axis_name)

    def norm_sq(self, x: jax.Array) -> jax.Array:
        if self.weight is not None:
            local = jnp.sum(self.weight[:, :, None] * jnp.abs(x) ** 2, axis=(0, 1))
        else:
            local = jnp.sum(jnp.abs(x) ** 2, axis=(0, 1))
        return psum_if(local, self.axis_name)

    def gram(self, V: jax.Array, y: jax.Array) -> jax.Array:
        """All basis dots at once: V (k, S, n, mu), y (S, n, mu) -> (k, mu).

        The CGS single-allreduce Gram step (HPDDM_iterative.hpp:489-522)."""
        if self.weight is not None:
            yw = self.weight[:, :, None] * y
        else:
            yw = y
        local = jnp.einsum("ksnm,snm->km", conj(V), yw)
        return psum_if(local, self.axis_name)
