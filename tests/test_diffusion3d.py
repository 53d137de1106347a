"""3D diffusion family: GMV exactness against the assembled 7-point
operator, two-level GenEO convergence, and the block-sparse coarse."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse.linalg as spla

from hpddm_tpu.models import diffusion3d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual, gmv
from hpddm_tpu.solvers.krylov import solve


def _pack(gen, sch):
    S = len(gen.mats)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    return jnp.asarray(f)


@pytest.mark.parametrize("S,N", [(8, 16), (4, 12), (2, 10)])
def test_gmv_exactness_3d(S, N):
    gen = diffusion3d.generate_uniform(S, N, N, N, overlap=1)
    A, _ = diffusion3d.assemble_global(N, N, N)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d)
    state = sch.build()
    rng = np.random.default_rng(0)
    g = rng.normal(size=N ** 3)
    x = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        x[s, : gen.n_loc[s], 0] = g[gen.gids[s]]
    y = np.asarray(state.dec.unpermute(
        gmv(state, state.dec.permute(jnp.asarray(x)))))
    ref = A @ g
    for s in range(S):
        np.testing.assert_allclose(y[s, : gen.n_loc[s], 0],
                                   ref[gen.gids[s]], atol=1e-9)


def test_two_level_geneo_3d():
    """Heterogeneous 3D: GenEO must cut iterations vs one-level, and the
    solution must match the global direct solve."""
    S, N = 8, 16

    def kappa(x, y, z):
        return np.where((np.floor(x / 2.5) + np.floor(y / 2.5)
                         + np.floor(z / 2.5)) % 2 == 0, 1.0, 1.0e3)

    gen = diffusion3d.generate_uniform(S, N, N, N, overlap=1, kappa=kappa,
                                       with_neumann=True)
    its = {}
    x_last = None
    sch0 = None
    for nu in (0, 8):
        kwargs = dict(tol=1e-8, max_it=200)
        if nu:
            kwargs.update(schwarz_coarse_correction="deflated", geneo_nu=nu)
        opt = Options(**kwargs)
        sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        if sch0 is None:
            sch0 = sch
        f = _pack(gen, sch)
        if nu:
            sch.solve_gevp(gen.neumann)
        state = sch.build()
        res = solve(state, f, opt=opt)
        nb, nr = compute_residual(state, res.x, f)
        assert float(np.asarray(nr)[0] / np.asarray(nb)[0]) < 1e-6
        its[nu] = int(res.iterations)
        x_last = res.x
    assert its[8] < its[0], its

    # solution check vs the assembled operator
    A, fg = diffusion3d.assemble_global(N, N, N, kappa=kappa)
    x_direct = spla.spsolve(A.tocsc(), fg)
    x_np = np.asarray(x_last)
    for s in range(len(gen.mats)):
        np.testing.assert_allclose(x_np[s, : gen.n_loc[s], 0],
                                   x_direct[gen.gids[s]],
                                   rtol=1e-4, atol=1e-6 * np.abs(
                                       x_direct).max())


def test_bsr_coarse_3d():
    """26-neighbor 3D adjacency through the block-sparse coarse."""
    S, N = 8, 16
    gen = diffusion3d.generate_uniform(S, N, N, N, overlap=1,
                                       with_neumann=True)
    opt = Options(tol=1e-8, max_it=200,
                  schwarz_coarse_correction="deflated", geneo_nu=4,
                  coarse_assembly="bsr")
    opt["level_2_tol"] = 1e-8
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    f = _pack(gen, sch)
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    assert state.coarse.mode == "bsr"
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(np.asarray(nr)[0] / np.asarray(nb)[0]) < 1e-6
    assert int(res.iterations) <= 60
