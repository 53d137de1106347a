"""Damped Richardson iteration (HPDDM_iterative.hpp Richardson branch,
option ``-hpddm_richardson_damping_factor``, default 1.0)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from hpddm_tpu.dtypes import HPDDM_EPS, underlying
from hpddm_tpu.solvers.base import LinearOperator
from hpddm_tpu.solvers.gmres import KrylovResult


def richardson(op: LinearOperator, b: jax.Array,
               x0: Optional[jax.Array] = None, tol: float = 1.0e-6,
               max_it: int = 100, damping: float = 1.0) -> KrylovResult:
    if x0 is None:
        x0 = jnp.zeros_like(b)
    rdtype = underlying(b.dtype)
    mu = b.shape[-1]
    norm = jnp.sqrt(op.init_norm_sq(b)).astype(rdtype)
    norm = jnp.where(norm < HPDDM_EPS, 1.0, norm)

    class Carry(NamedTuple):
        x: jax.Array
        it: jax.Array
        first_it: jax.Array
        res: jax.Array
        hist: jax.Array

    def cond(c: Carry):
        return (c.it <= max_it) & jnp.any(c.first_it == 0)

    def body(c: Carry) -> Carry:
        r = b - op.gmv(c.x)
        x = c.x + damping * op.apply(r)
        res = jnp.sqrt(op.norm_sq(r)).astype(rdtype)
        crossed = res <= tol * norm
        first_new = jnp.where((c.first_it == 0) & crossed, c.it, c.first_it)
        hist = c.hist.at[jnp.minimum(c.it, max_it)].set(
            (res / norm).astype(c.hist.dtype))
        return Carry(x, c.it + 1, first_new, res / norm, hist)

    carry0 = Carry(x0, jnp.int32(1), jnp.zeros((mu,), jnp.int32),
                   jnp.full((mu,), jnp.inf, dtype=rdtype),
                   jnp.full((max_it + 1, mu), -1.0, dtype=rdtype))
    f = lax.while_loop(cond, body, carry0)
    it_per_rhs = jnp.where(f.first_it > 0, f.first_it,
                           jnp.minimum(f.it - 1, max_it))
    return KrylovResult(x=f.x, iterations=jnp.max(it_per_rhs),
                        it_per_rhs=it_per_rhs, rel_res=f.res,
                        converged=f.first_it > 0, history=f.hist)
