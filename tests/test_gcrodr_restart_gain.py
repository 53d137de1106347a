"""Deflated-restarting gain oracle: where plain restarted GMRES stagnates,
GCRO-DR must converge (the contract of GCRODR deflation; cf. the
reference's driver.cpp iteration-window regression)."""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from hpddm_tpu.solvers.base import LinearOperator
from hpddm_tpu.solvers.gcrodr import gcrodr
from hpddm_tpu.solvers.gmres import gmres


def test_gcrodr_beats_stagnating_restarted_gmres():
    n = 100
    A = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    Ad = jnp.asarray(A.todense())
    op = LinearOperator(gmv=lambda x: jnp.einsum("nk,skm->snm", Ad, x))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(1, n, 1)))
    rg = gmres(op, b, tol=1e-8, restart=10, max_it=2000)
    rr = gcrodr(op, b, tol=1e-8, restart=10, max_it=2000, recycle=5)
    rr2 = gcrodr(op, b, tol=1e-8, restart=10, max_it=2000, recycle=5,
                 recycled=rr.recycled, same_system=True)
    assert int(rg.iterations) >= 1500          # restarted GMRES stagnates
    assert int(rr.iterations) < 500            # deflation restores progress
    assert int(rr2.iterations) < int(rr.iterations)  # warm recycling helps
    x = np.asarray(rr2.x)[0, :, 0]
    r = np.asarray(b)[0, :, 0] - A @ x
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-7


def test_gcrodr_strategy_b_matches_contract():
    """-hpddm_recycle_strategy B (the cheaper pencil without the Q^H W
    cross products, HPDDM_GCRODR.hpp:322-382) must also restore progress
    where restarted GMRES stagnates, and converge to the right answer."""
    n = 100
    A = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    Ad = jnp.asarray(A.todense())
    op = LinearOperator(gmv=lambda x: jnp.einsum("nk,skm->snm", Ad, x))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(1, n, 1)))
    ra = gcrodr(op, b, tol=1e-8, restart=10, max_it=2000, recycle=5)
    rb = gcrodr(op, b, tol=1e-8, restart=10, max_it=2000, recycle=5,
                strategy="B")
    assert int(rb.iterations) < 500
    # the two pencils select comparable deflation spaces on this SPD model
    assert abs(int(rb.iterations) - int(ra.iterations)) < 150
    x = np.asarray(rb.x)[0, :, 0]
    r = np.asarray(b)[0, :, 0] - A @ x
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-7
