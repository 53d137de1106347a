"""FETI / BDD substructuring tests: solutions must match the global direct
solve (the reference ships no in-tree FETI driver; validation is against
the assembled operator)."""

import numpy as np
import scipy.sparse.linalg as spla
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import nonoverlap
from hpddm_tpu.precond.substructure import (Substructure, feti_solve,
                                            bdd_solve, feti_operator,
                                            bt_apply, b_apply)


def _assemble_check(gen):
    """sum_s R^T K_s R must equal the global operator."""
    import scipy.sparse as sp
    N = gen.A_global.shape[0]
    acc = sp.csr_matrix((N, N))
    for s, m in enumerate(gen.mats):
        R = sp.csr_matrix((np.ones(len(gen.gids[s])),
                           (gen.gids[s], np.arange(len(gen.gids[s])))),
                          shape=(N, len(gen.gids[s])))
        acc = acc + R @ m.scipy() @ R.T
    assert abs(acc - gen.A_global).max() < 1e-12


def _pack_f(gen, sub):
    S = len(gen.mats)
    f = np.zeros((S, sub.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s], 0] = gen.f[s]
    return jnp.asarray(f)


def _check_solution(gen, u, atol=1e-6):
    """Average duplicated dofs, compare against the direct solve."""
    N = gen.A_global.shape[0]
    x_direct = spla.spsolve(gen.A_global.tocsc(), gen.f_global)
    acc = np.zeros(N)
    cnt = np.zeros(N)
    u_np = np.asarray(u)
    for s in range(len(gen.mats)):
        acc[gen.gids[s]] += u_np[s, : gen.n_loc[s], 0]
        cnt[gen.gids[s]] += 1
    x = acc / cnt
    err = np.linalg.norm(x - x_direct) / np.linalg.norm(x_direct)
    assert err < atol, f"relative error {err}"
    # continuity across copies
    for s in range(len(gen.mats)):
        np.testing.assert_allclose(u_np[s, : gen.n_loc[s], 0],
                                   x_direct[gen.gids[s]], atol=100 * atol,
                                   rtol=0.1)


@pytest.mark.parametrize("S,Nx,Ny", [(4, 20, 20), (2, 16, 24)])
def test_splitting_and_feti(S, Nx, Ny):
    gen = nonoverlap.generate(S, Nx, Ny)
    _assemble_check(gen)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings)
    st = sub.state
    f = _pack_f(gen, sub)
    res = feti_solve(st, f, tol=1e-10, max_it=200)
    assert int(res.iterations) < 60
    _check_solution(gen, res.u, atol=1e-6)


def test_feti_floating_subdomain():
    """3x3 boxes: the center subdomain is floating (nontrivial kernel)."""
    gen = nonoverlap.generate(9, 24, 24)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings)
    st = sub.state
    assert int(np.asarray(st.r_loc).max()) >= 1  # at least one floating
    f = _pack_f(gen, sub)
    res = feti_solve(st, f, tol=1e-10, max_it=300)
    _check_solution(gen, res.u, atol=1e-5)


def test_feti_operator_symmetry():
    """F = B K^+ B^T must be symmetric PSD on the multiplier space."""
    gen = nonoverlap.generate(4, 12, 12)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings)
    st = sub.state
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(st.N_l, 1)))
    y = jnp.asarray(rng.normal(size=(st.N_l, 1)))
    Fx = feti_operator(st, x)
    Fy = feti_operator(st, y)
    lhs = float(jnp.sum(y * Fx))
    rhs = float(jnp.sum(x * Fy))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)
    assert float(jnp.sum(x * Fx)) >= -1e-10


@pytest.mark.parametrize("S,Nx,Ny", [(4, 20, 20), (9, 24, 24)])
def test_bdd(S, Nx, Ny):
    gen = nonoverlap.generate(S, Nx, Ny)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings)
    st = sub.state
    f = _pack_f(gen, sub)
    res = bdd_solve(st, f, tol=1e-10, max_it=300)
    assert int(res.iterations) < 80
    _check_solution(gen, res.u, atol=1e-5)


@pytest.mark.parametrize("precond", ["dirichlet", "lumped", "superlumped",
                                     "none"])
def test_feti_preconditioner_variants(precond):
    """FetiPrcndtnr::{DIRICHLET,LUMPED,SUPERLUMPED,NONE}
    (HPDDM_enum.hpp:39-44)."""
    gen = nonoverlap.generate(4, 16, 16)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings)
    st = sub.state
    f = _pack_f(gen, sub)
    res = feti_solve(st, f, tol=1e-9, max_it=300, precond=precond)
    _check_solution(gen, res.u, atol=1e-5)


def test_geneo_enrichment():
    """Schur::solveGEVP enrichment (HPDDM_schur.hpp:161-271): the selected
    traces enlarge BDD's balancing space and, with ``feti_deflation=True``,
    deflate FETI's projected operator P F P^T. Both must cut iterations on
    a high-contrast split while keeping the primal solution exact."""
    gen = nonoverlap.generate(9, 24, 24, contrast=1e4, checker=6)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings)
    f = _pack_f(gen, sub)
    base = feti_solve(sub.state, f, tol=1e-9, max_it=400)
    st = sub.solve_gevp(nu=6, feti_deflation=True)
    defl = feti_solve(st, f, tol=1e-9, max_it=400)
    assert int(defl.iterations) < int(base.iterations)
    _check_solution(gen, defl.u, atol=1e-5)
    base_bdd = bdd_solve(sub.state, f, tol=1e-9, max_it=400)
    enr_bdd = bdd_solve(st, f, tol=1e-9, max_it=400)
    # balancing enrichment must never hurt, and the solution stays exact
    assert int(enr_bdd.iterations) <= int(base_bdd.iterations)
    _check_solution(gen, enr_bdd.u, atol=1e-5)


@pytest.mark.parametrize("mode", ["mfree", "cheby"])
def test_matrix_free_coarse_feti_bdd(mode):
    """-hpddm_substructuring_coarse mfree|cheby: matrix-free coarse solves
    (no replicated dense G, no materialized BDD balancing basis) must
    reproduce the dense-coarse solutions. mfree is exact (same iteration
    counts); cheby is a fixed-degree Chebyshev approximation (within a few
    iterations)."""
    from hpddm_tpu.options import Options
    gen = nonoverlap.generate(9, 24, 24)
    dense = Substructure(gen.mats, gen.neighbors, gen.mappings)
    mf = Substructure(gen.mats, gen.neighbors, gen.mappings,
                      options=Options(substructuring_coarse=mode))
    assert mf.state.G is None
    if mode == "cheby":
        assert mf.state.GtG_inv is None
        assert mf.state.coarse_degree >= 8
    f = _pack_f(gen, dense)
    r_dense = feti_solve(dense.state, f, tol=1e-10, max_it=300)
    r_mf = feti_solve(mf.state, f, tol=1e-10, max_it=300)
    _check_solution(gen, r_mf.u, atol=1e-5)
    it_slack = 0 if mode == "mfree" else 5
    assert abs(int(r_mf.iterations) - int(r_dense.iterations)) <= it_slack
    b_dense = bdd_solve(dense.state, f, tol=1e-10, max_it=300)
    b_mf = bdd_solve(mf.state, f, tol=1e-10, max_it=300)
    _check_solution(gen, b_mf.u, atol=1e-5)
    assert abs(int(b_mf.iterations) - int(b_dense.iterations)) <= it_slack + 5


def test_cheby_coarse_geneo_enrichment():
    """Chebyshev coarse + GenEO enrichment: bounds are re-estimated after
    the balancing space grows; solutions stay exact."""
    from hpddm_tpu.options import Options
    gen = nonoverlap.generate(9, 24, 24, contrast=1e4, checker=6)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings,
                       options=Options(substructuring_coarse="cheby"))
    f = _pack_f(gen, sub)
    base = feti_solve(sub.state, f, tol=1e-9, max_it=400)
    st = sub.solve_gevp(nu=6, feti_deflation=True)
    defl = feti_solve(st, f, tol=1e-9, max_it=400)
    assert int(defl.iterations) < int(base.iterations)
    _check_solution(gen, defl.u, atol=1e-5)
    enr_bdd = bdd_solve(st, f, tol=1e-9, max_it=400)
    _check_solution(gen, enr_bdd.u, atol=1e-5)


def test_stiffness_scaling():
    """-hpddm_substructuring_scaling stiffness on a heterogeneous split."""
    from hpddm_tpu.options import Options
    gen = nonoverlap.generate(4, 20, 20, contrast=1e3)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings,
                       options=Options(substructuring_scaling="stiffness"))
    f = _pack_f(gen, sub)
    res = feti_solve(sub.state, f, tol=1e-9, max_it=400)
    _check_solution(gen, res.u, atol=1e-5)
    assert int(res.iterations) < 400
