"""Algebraic matrix-overlap exchange (Schwarz::exchange() matrix variant,
HPDDM_schwarz.hpp:190-275) and boolean POU rounding (Schwarz::restriction,
HPDDM_schwarz.hpp:277-333)."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from hpddm_tpu.core.csr import MatrixCSR
from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.parallel.decomposition import restrict_pou
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual, gmv
from hpddm_tpu.solvers.krylov import solve


def test_exchange_matrices_completes_overlap():
    """Corrupt the non-owned overlap rows of every local matrix (as if
    assembled from a distributed matrix with stale ghost values); after
    exchange_matrices() the shared blocks must equal the owner's values
    and the two-level solve must match the clean problem."""
    S = 4
    gen = diffusion2d.generate_uniform(S, 48, 48, overlap=2)
    clean = [m.scipy(expand=True).tocsr() for m in gen.mats]

    rng = np.random.default_rng(0)
    dirty = []
    for s in range(S):
        A = clean[s].copy().tolil()
        d = np.asarray(gen.d[s])
        bad = np.nonzero(d < 1e-12)[0]          # non-owned overlap rows
        for r in bad:
            cols = clean[s][r].indices
            A[r, cols] = rng.normal(size=len(cols))
        dirty.append(MatrixCSR(sp.csr_matrix(A)))

    sch = Schwarz(dirty, gen.neighbors, gen.mappings, d=gen.d,
                  options=Options(tol=1e-8))
    sch.exchange_matrices()

    # every shared block must now carry the owner's values
    for s in range(S):
        got = sch.mats[s].scipy(expand=True).tocsr()
        for q, idx in zip(gen.neighbors[s], gen.mappings[s]):
            blk_got = got[idx][:, idx].toarray()
            blk_ref = clean[s][idx][:, idx].toarray()
            np.testing.assert_allclose(blk_got, blk_ref, atol=1e-12,
                                       err_msg=f"{s}<-{q}")

    # and the repacked operator solves the clean problem: GMV touches only
    # rows where the POU is nonzero, which the exchange restored
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = jnp.asarray(f)
    sch_ref = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=Options(tol=1e-8))
    x_ref = solve(sch_ref.build(), f, opt=sch_ref.opt).x
    res = solve(sch.build(), f, opt=sch.opt)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-9)


def test_restrict_pou_rounds_to_boolean():
    """Fractional overlap POU -> boolean ownership: exactly one sharer of
    every duplicated dof gets 1 (the largest value; ties to the higher
    id), and the rounded POU still sums to 1 classwise."""
    S = 4
    gen = diffusion2d.generate_uniform(S, 32, 32, overlap=2)
    d_list = [np.asarray(d, dtype=np.float64).copy() for d in gen.d]
    assert restrict_pou(gen.neighbors, gen.mappings, d_list) is True
    for d in d_list:
        assert set(np.round(np.unique(d), 12)).issubset({0.0, 1.0})
    # classwise sum == 1: a Schwarz built with the boolean POU ("given"
    # scaling keeps it) must still satisfy sum_q R^T D R = I
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=d_list,
                  options=Options())
    ones = jnp.ones((S, sch.n_max, 1))
    out = sch.exchange_rhs(ones)     # scaled exchange of a consistent 1
    mask = np.asarray(sch.dec.row_mask)
    np.testing.assert_allclose(np.asarray(out)[mask], 1.0, atol=1e-12)

    # idempotent: a boolean POU does not change again
    assert restrict_pou(gen.neighbors, gen.mappings, d_list) is False
