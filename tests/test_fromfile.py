"""Algebraic (from-file) decomposition tests on the reference's mini.mtx
(Makefile:359-371: np in {2,4} x overlap in {1,3}) and on synthetic
matrices."""

import os
import subprocess
import tarfile

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from hpddm_tpu.core.csr import MatrixCSR
from hpddm_tpu.models import fromfile
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual, gmv
from hpddm_tpu.solvers.krylov import solve

MINI_TGZ = "/root/reference/examples/data/mini.tar.gz"


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    if not os.path.exists(MINI_TGZ):
        pytest.skip("mini.tar.gz not available")
    d = tmp_path_factory.mktemp("mini")
    with tarfile.open(MINI_TGZ) as t:
        t.extractall(d)
    return MatrixCSR.from_file(str(d / "mini.mtx"))


def test_gmv_exactness_fromfile(mini):
    """GMV on the algebraic decomposition must equal the assembled matrix."""
    S = 4
    gen = fromfile.decompose(mini, S, overlap=2)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d)
    state = sch.build()
    rng = np.random.default_rng(0)
    g = rng.normal(size=mini.n)
    x = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        x[s, : gen.n_loc[s], 0] = g[gen.gids[s]]
    y = np.asarray(state.dec.unpermute(
        gmv(state, state.dec.permute(jnp.asarray(x)))))
    ref = gen.A_global @ g
    for s in range(S):
        np.testing.assert_allclose(y[s, : gen.n_loc[s], 0],
                                   ref[gen.gids[s]], atol=1e-10)


@pytest.mark.parametrize("S,overlap", [(2, 1), (4, 1), (2, 3), (4, 3)])
def test_mini_solve(mini, S, overlap):
    """The make-test schwarzFromFile sweep: converge on mini.mtx."""
    gen = fromfile.decompose(mini, S, overlap=overlap)
    opt = Options(tol=1e-6, max_it=200)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d, options=opt)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = jnp.asarray(f)
    state = sch.build()
    res = solve(state, f, opt=opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) <= 1e-2
    assert bool(np.asarray(res.converged).all())


def test_partitioner_balance():
    A = MatrixCSR(sp.diags([np.ones(199), 2 * np.ones(200), np.ones(199)],
                           [-1, 0, 1]).tocsr())
    owner = fromfile.partition_kway(A.scipy(), 4)
    counts = np.bincount(owner, minlength=4)
    assert counts.min() >= 40  # roughly balanced


def test_mini_bsr_coarse(mini):
    """Block-sparse coarse (-hpddm_coarse_assembly bsr) on the algebraic
    (irregular) decomposition: the slot/partner machinery must feed the
    neighbor-block assembly just like the grid decompositions."""
    S = 4
    gen = fromfile.decompose(mini, S, overlap=2)
    opt = Options(tol=1e-6, max_it=200,
                  schwarz_coarse_correction="deflated",
                  coarse_assembly="bsr")
    opt["level_2_tol"] = 1e-8
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = jnp.asarray(f)
    state = sch.build()
    assert state.coarse.mode == "bsr"
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(np.asarray(nr)[0] / np.asarray(nb)[0]) < 1e-2
    assert int(res.iterations) < 200


def test_partition_gg_beats_rcm_on_mini():
    """Round 4 (VERDICT r3 #9): the graph-growing + KL partitioner must
    cut interface dofs and iterations vs the RCM strip fallback on the
    reference's mini.mtx (measured when written: S=32 interface 821 vs
    945, iterations 24 vs 32, sum of local dofs 2363 vs 2845)."""
    import numpy as np
    import jax.numpy as jnp
    from hpddm_tpu.core.csr import MatrixCSR
    from hpddm_tpu.models import fromfile
    from hpddm_tpu.options import Options
    from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
    from hpddm_tpu.solvers.krylov import solve
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import refparity as rp

    if rp.build_reference_schwarz(fromfile=True) is None:
        import pytest
        pytest.skip("mini.mtx unavailable")
    M = MatrixCSR.from_file(os.path.join(rp.BUILD_DIR, "data", "mini.mtx"))
    A = M.scipy(expand=True)
    out = {}
    for meth in ("rcm", "gg"):
        S = 32
        owner = fromfile.partition_kway(A, S, method=meth)
        gen = fromfile.decompose(M, S, overlap=2,
                                 f_global=np.ones(M.n), owner=owner)
        counts = np.zeros(M.n)
        for g in gen.gids:
            counts[g] += 1
        opt = Options(tol=1e-8, max_it=500)
        sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        f = np.zeros((S, sch.n_max, 1))
        for s in range(S):
            f[s, : gen.n_loc[s], 0] = np.asarray(gen.f[s]).ravel()
        f = sch.exchange_rhs(jnp.asarray(f))
        st = sch.build()
        res = solve(st, f, opt=opt)
        nb, nr = compute_residual(st, res.x, f)
        assert float(nr[0] / nb[0]) < 1e-6
        out[meth] = (int((counts > 1).sum()), int(res.iterations))
    assert out["gg"][0] < out["rcm"][0], out     # fewer interface dofs
    assert out["gg"][1] <= out["rcm"][1], out    # no more iterations


def test_spsd_neumann_geneo():
    """Fully-algebraic GenEO (round 5): the SPSD edge splitting of the
    assembled matrix yields SPSD local pencils whose prolongated sum
    reproduces K (exact for weakly diagonally dominant K), and the
    resulting coarse space cuts iterations — the PCHPDDM +
    aldaas2021robust front-end with no user auxiliary matrices."""
    import scipy.sparse as sp
    from hpddm_tpu.models import diffusion2d

    # heterogeneous 5-point matrix assembled globally (M-matrix: exact)
    g1 = diffusion2d.generate(1, 60, 60, overlap=0)
    K = g1.mats[0].scipy(expand=True)
    S = 8
    gen = fromfile.decompose(MatrixCSR(sp.csr_matrix(K)), S, overlap=2)
    neu = fromfile.spsd_neumann(gen)
    # exact prolongated sum + SPSD
    acc = sp.csr_matrix(K.shape)
    for s in range(S):
        g = gen.gids[s]
        R = sp.csr_matrix((np.ones(len(g)), (np.arange(len(g)), g)),
                          shape=(len(g), K.shape[0]))
        acc = acc + R.T @ neu[s].scipy(expand=True) @ R
    Ksym = (K + K.T) * 0.5
    assert abs(acc - Ksym).max() < 1e-10 * abs(Ksym).max()
    w = np.linalg.eigvalsh(neu[0].dense(expand=True))
    assert w.min() > -1e-10 * w.max()

    its = {}
    for cc in (None, "deflated"):
        opt = Options(tol=1e-8, **({} if cc is None else dict(
            schwarz_coarse_correction=cc, geneo_nu=8)))
        sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        if cc:
            sch.solve_gevp(neu)
        st = sch.build()
        f = np.zeros((S, sch.n_max, 1))
        for s in range(S):
            f[s, : gen.n_loc[s]] = gen.f[s]
        r = solve(st, jnp.asarray(f), opt=opt)
        its[cc] = int(r.iterations)
    assert its["deflated"] < its[None]
    assert its["deflated"] <= 16
