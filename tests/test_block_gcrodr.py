"""Block methods and GCRO-DR tests.

GCRO-DR is validated the way the reference's driver.cpp does: solve a
*sequence* of linear systems and check that recycling reduces the total
iteration count (driver.cpp:151-156 uses absolute windows on its shipped
data, which is not in the tree — .MISSING_LARGE_BLOBS)."""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from hpddm_tpu.solvers.base import LinearOperator
from hpddm_tpu.solvers.block import bgmres, bcg, bfbcg
from hpddm_tpu.solvers.gmres import gmres
from hpddm_tpu.solvers.gcrodr import gcrodr


def _laplacian_1d(n, shift=0.0):
    main = (2.0 + shift) * np.ones(n)
    off = -1.0 * np.ones(n - 1)
    return sp.diags([off, main, off], [-1, 0, 1]).tocsr()


def _op(A, M_diag=None):
    Ad = jnp.asarray(A.todense())

    def gmv(x):
        return jnp.einsum("nk,skm->snm", Ad, x)

    apply = None
    if M_diag is not None:
        Md = jnp.asarray(1.0 / M_diag)

        def apply(x):  # noqa: F811
            return Md[None, :, None] * x
    return LinearOperator(gmv=gmv, apply=apply)


def test_bgmres_converges():
    n, mu = 60, 4
    A = _laplacian_1d(n)
    rng = np.random.default_rng(0)
    b = rng.normal(size=(1, n, mu))
    op = _op(A, A.diagonal())
    res = bgmres(op, jnp.asarray(b), tol=1e-8, restart=40, max_it=200)
    x = np.asarray(res.x)
    for nu in range(mu):
        r = b[0, :, nu] - A @ x[0, :, nu]
        assert np.linalg.norm(r) / np.linalg.norm(b[0, :, nu]) < 1e-7
    # block method must need fewer iterations than pseudo-block GMRES
    res_g = gmres(op, jnp.asarray(b), tol=1e-8, restart=40, max_it=200)
    assert int(res.iterations) <= int(res_g.iterations)


def test_bcg_spd():
    n, mu = 50, 3
    A = _laplacian_1d(n)
    rng = np.random.default_rng(1)
    b = rng.normal(size=(1, n, mu))
    op = _op(A, A.diagonal())
    res = bcg(op, jnp.asarray(b), tol=1e-9, max_it=200)
    x = np.asarray(res.x)
    for nu in range(mu):
        r = b[0, :, nu] - A @ x[0, :, nu]
        assert np.linalg.norm(r) / np.linalg.norm(b[0, :, nu]) < 1e-8


def test_bfbcg_with_dependent_rhs():
    """Nearly dependent RHS: breakdown-free handling must still converge."""
    n = 40
    A = _laplacian_1d(n)
    rng = np.random.default_rng(2)
    b1 = rng.normal(size=n)
    b = np.stack([b1, b1 + 1e-10 * rng.normal(size=n), rng.normal(size=n)],
                 axis=1)[None]
    op = _op(A, A.diagonal())
    res = bfbcg(op, jnp.asarray(b), tol=1e-8, max_it=200, deflation_tol=1e-12)
    x = np.asarray(res.x)
    for nu in range(3):
        r = b[0, :, nu] - A @ x[0, :, nu]
        assert np.linalg.norm(r) / np.linalg.norm(b[0, :, nu]) < 1e-7


def test_gcrodr_single_solve():
    n = 80
    A = _laplacian_1d(n)
    rng = np.random.default_rng(3)
    b = rng.normal(size=(1, n, 1))
    op = _op(A, A.diagonal())
    res = gcrodr(op, jnp.asarray(b), tol=1e-8, restart=20, max_it=300,
                 recycle=5)
    x = np.asarray(res.x)
    r = b[0, :, 0] - A @ x[0, :, 0]
    assert np.linalg.norm(r) / np.linalg.norm(b[0, :, 0]) < 1e-7
    assert res.recycled is not None


def test_gcrodr_recycling_reduces_iterations():
    """Across a sequence of similar systems total its drop vs plain GMRES
    (the driver.cpp contract)."""
    n = 100
    rng = np.random.default_rng(4)
    systems = [_laplacian_1d(n, shift=0.001 * i) for i in range(4)]
    b = rng.normal(size=(1, n, 1))
    bj = jnp.asarray(b)

    total_gmres = 0
    for A in systems:
        op = _op(A)
        r = gmres(op, bj, tol=1e-8, restart=20, max_it=500)
        total_gmres += int(r.iterations)

    total_recycled = 0
    rec = None
    for i, A in enumerate(systems):
        op = _op(A)
        r = gcrodr(op, bj, tol=1e-8, restart=20, max_it=500, recycle=8,
                   recycled=rec)
        rec = r.recycled
        total_recycled += int(r.iterations)

    assert total_recycled < total_gmres, (total_recycled, total_gmres)


def test_bgcrodr_multi_rhs():
    """BGCRODR: several RHS share a recycled space; later columns converge
    faster than the first (warm deflation)."""
    n = 100
    A = _laplacian_1d(n)
    Ad = jnp.asarray(A.todense())
    op = LinearOperator(gmv=lambda x: jnp.einsum("nk,skm->snm", Ad, x))
    rng = np.random.default_rng(9)
    b = jnp.asarray(rng.normal(size=(1, n, 3)))
    from hpddm_tpu.solvers.gcrodr import bgcrodr
    res = bgcrodr(op, b, tol=1e-8, restart=15, max_it=2000, recycle=7)
    x = np.asarray(res.x)
    for j in range(3):
        r = np.asarray(b)[0, :, j] - A @ x[0, :, j]
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)[0, :, j]) \
            < 1e-7
    its = np.asarray(res.it_per_rhs)
    assert its[1] < its[0] and its[2] < its[0], its


def test_bgcrodr_fused_true_block():
    """True block GCRO-DR: where BGMRES(12) stagnates, the fused block
    recycling converges, warm recycling improves it, and the solution is
    exact; dispatched via -hpddm_krylov_method bgcrodr for mu > 1."""
    import scipy.sparse as sp
    from hpddm_tpu.solvers.gcrodr import bgcrodr_fused
    from hpddm_tpu.solvers.block import bgmres
    n, mu = 100, 3
    A = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    Ad = jnp.asarray(A.todense())
    op = LinearOperator(gmv=lambda x: jnp.einsum("nk,skm->snm", Ad, x))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(1, n, mu)))
    rg = bgmres(op, b, tol=1e-8, restart=12, max_it=2000)
    assert int(rg.iterations) >= 1500          # plain block GMRES stagnates
    rf = bgcrodr_fused(op, b, tol=1e-8, restart=12, max_it=2000, recycle=6)
    assert int(rf.iterations) < 600            # block deflation restores it
    rw = bgcrodr_fused(op, b, tol=1e-8, restart=12, max_it=2000, recycle=6,
                       recycled=rf.recycled, same_system=True)
    assert int(rw.iterations) < int(rf.iterations)   # warm recycling helps
    for r in (rf, rw):
        x = np.asarray(r.x)[0]
        rr = np.asarray(b)[0] - A @ x
        rel = np.linalg.norm(rr, axis=0) / np.linalg.norm(np.asarray(b)[0],
                                                          axis=0)
        assert rel.max() < 1e-7


def test_recycling_across_solves_via_options():
    """Cross-solve recycling through the option system alone: the (U, C)
    pair persists in Options' per-prefix storage (the analogue of
    OptionsPrefix::storage_, HPDDM_option.hpp:444-461) — the second
    solve() of the same system must start from the recycled space and
    converge in fewer iterations, and -hpddm_recycle_same_system must
    skip the re-projection without losing the gain."""
    from hpddm_tpu.options import Options
    from hpddm_tpu.solvers.krylov import solve

    n = 120
    A = _laplacian_1d(n)
    op = _op(A)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.normal(size=(1, n, 1)))

    opt = Options(krylov_method="gcrodr", recycle=8, gmres_restart=15,
                  tol=1e-8, max_it=1000)
    r1 = solve(op, b, opt=opt)
    assert opt.storage() is not None          # space was stored
    r2 = solve(op, b, opt=opt)                # reuses it automatically
    assert int(r2.iterations) < int(r1.iterations), (
        int(r1.iterations), int(r2.iterations))

    opt["recycle_same_system"] = 1
    r3 = solve(op, b, opt=opt)
    assert int(r3.iterations) <= int(r2.iterations) + 2

    # a fresh Options has no storage: back to the cold count
    r4 = solve(op, b, opt=Options(krylov_method="gcrodr", recycle=8,
                                  gmres_restart=15, tol=1e-8, max_it=1000))
    assert int(r4.iterations) == int(r1.iterations)


def test_gcrodr_pseudo_block_multi_rhs():
    """Pseudo-block GCRO-DR (mu > 1): per-RHS Hessenbergs and recycled
    pairs around fused operator applications (HPDDM_GCRODR.hpp:35-444,
    per-RHS slabs in the ``for nu < mu`` loops). Each column must match
    the accuracy of its own mu=1 solve, per-RHS iteration counts are
    tracked, and the per-RHS recycled spaces cut iterations on a second
    solve of the same family."""
    n, mu = 90, 3
    A = _laplacian_1d(n, shift=-0.8)          # indefinite-ish: GMRES labors
    rng = np.random.default_rng(7)
    b = rng.normal(size=(1, n, mu))
    op = _op(A, A.diagonal())
    res = gcrodr(op, jnp.asarray(b), tol=1e-8, restart=15, max_it=1000,
                 recycle=6)
    x = np.asarray(res.x)
    for nu in range(mu):
        r = b[0, :, nu] - A @ x[0, :, nu]
        assert np.linalg.norm(r) / np.linalg.norm(b[0, :, nu]) < 1e-7, nu
    assert res.recycled is not None
    assert res.recycled.U.shape == (1, n, 6, mu)      # per-RHS spaces
    assert res.it_per_rhs.shape == (mu,)

    # column parity: each RHS behaves like its own mu=1 solve
    for nu in range(mu):
        r1 = gcrodr(op, jnp.asarray(b[:, :, nu: nu + 1]), tol=1e-8,
                    restart=15, max_it=1000, recycle=6)
        assert abs(int(res.it_per_rhs[nu]) - int(r1.iterations)) <= 2, (
            nu, int(res.it_per_rhs[nu]), int(r1.iterations))

    # warm restart from the per-RHS recycled spaces
    res2 = gcrodr(op, jnp.asarray(b), tol=1e-8, restart=15, max_it=1000,
                  recycle=6, recycled=res.recycled, same_system=True)
    assert int(res2.iterations) < int(res.iterations), (
        int(res.iterations), int(res2.iterations))


def test_gcrodr_pseudo_block_via_solve_dispatch():
    """-hpddm_krylov_method gcrodr with mu > 1 dispatches to the
    pseudo-block path (not a sequential per-column loop) and stores the
    4-D per-RHS recycled space for the next solve()."""
    from hpddm_tpu.options import Options
    from hpddm_tpu.solvers.krylov import solve

    n, mu = 100, 2
    A = _laplacian_1d(n)
    op = _op(A)
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.normal(size=(1, n, mu)))
    opt = Options(krylov_method="gcrodr", recycle=6, gmres_restart=12,
                  tol=1e-8, max_it=1000)
    r1 = solve(op, b, opt=opt)
    stored = opt.storage()
    assert stored is not None and stored.U.shape[-1] == mu
    x = np.asarray(r1.x)
    for nu in range(mu):
        r = np.asarray(b)[0, :, nu] - A @ x[0, :, nu]
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)[0, :, nu]) \
            < 1e-7
    r2 = solve(op, b, opt=opt)
    assert int(r2.iterations) < int(r1.iterations)
