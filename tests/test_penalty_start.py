"""Dirichlet-penalty detection and initial-guess seeding: the analogue of
Subdomain::boundaryCond (HPDDM_subdomain.hpp:310-336) + Schwarz::start
(HPDDM_schwarz.hpp:496-514). Penalty rows must be exact at iteration 0 and
the seeded solve must converge to the boundary value."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from hpddm_tpu.core.csr import MatrixCSR
from hpddm_tpu.dtypes import HPDDM_PEN
from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual, start
from hpddm_tpu.solvers.krylov import solve


def _penalized_problem(S=4, Nx=40, Ny=40, g=1.7):
    """Oracle diffusion problem with the global j == 0 boundary clamped to
    g by the reference's penalty style (diag += HPDDM_PEN, f = PEN * g)."""
    gen = diffusion2d.generate(S, Nx, Ny, overlap=1)
    mats, fs, pen_rows = [], [], []
    for s, (i0, i1, j0, j1) in enumerate(gen.boxes):
        A = gen.mats[s].scipy(expand=True).tolil()
        f = np.asarray(gen.f[s]).copy()
        rows = np.arange(i1 - i0) if j0 == 0 else np.zeros(0, dtype=int)
        for r in rows:
            A[r, r] = A[r, r] + HPDDM_PEN
            f[r, 0] = HPDDM_PEN * g
        pen_rows.append(rows)
        mats.append(MatrixCSR(sp.csr_matrix(A)))
        fs.append(f)
    return gen, mats, fs, pen_rows


def test_penalty_rows_detected_and_seeded():
    g = 1.7
    gen, mats, fs, pen_rows = _penalized_problem(g=g)
    opt = Options(tol=1e-8, max_it=200)
    sch = Schwarz(mats, gen.neighbors, gen.mappings, d=gen.d, options=opt)
    state = sch.build()
    assert state.bc is not None
    f = np.zeros((len(mats), sch.n_max, 1))
    for s in range(len(mats)):
        f[s, : gen.n_loc[s]] = fs[s]
    f = jnp.asarray(f)

    # detection: exactly the penalized rows carry a boundary value
    bc = np.asarray(sch.dec.unpermute(state.bc[:, :, None])[:, :, 0])
    for s, rows in enumerate(pen_rows):
        flags = np.zeros(sch.n_max, dtype=bool)
        flags[rows] = True
        assert ((np.abs(bc[s]) > 1e-6) == flags).all(), s

    # start(): penalty rows exact at iteration 0
    fi = sch.dec.permute(f)
    x0 = sch.dec.unpermute(start(state, fi))
    for s, rows in enumerate(pen_rows):
        if len(rows):
            np.testing.assert_allclose(np.asarray(x0[s, rows, 0]), g,
                                       rtol=1e-10)

    # the dispatch seeds automatically (x0 unset) and converges to g
    res = solve(state, f, opt=opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) < 1e-6
    for s, rows in enumerate(pen_rows):
        if len(rows):
            np.testing.assert_allclose(np.asarray(res.x[s, rows, 0]), g,
                                       rtol=1e-8)


def test_rebuild_with_penalty_rows():
    """Second build() on a Schwarz whose _bc_cache holds a jnp array must
    not crash (ADVICE r4 high: `cached != ()` raised TypeError on arrays;
    rebuild-after-option-change is a normal pattern)."""
    gen, mats, fs, pen_rows = _penalized_problem()
    sch = Schwarz(mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=Options(tol=1e-8))
    s1 = sch.build()
    assert s1.bc is not None
    s2 = sch.build()            # memo hit: must return the cached array
    np.testing.assert_array_equal(np.asarray(s1.bc), np.asarray(s2.bc))
    # update_matrices resets the memo to the sentinel, not an array
    sch.update_matrices(mats)
    s3 = sch.build()
    np.testing.assert_array_equal(np.asarray(s1.bc), np.asarray(s3.bc))


def test_no_penalty_means_no_bc_state():
    """Oracle problems without penalty rows keep bc=None (start is the
    identity; iteration counts untouched)."""
    gen = diffusion2d.generate(4, 40, 40, overlap=1)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=Options())
    assert sch.build().bc is None
