"""Dense Schwarz variant tests (HPDDM_dense.hpp analogue): dense local
blocks, user-supplied GMV, standard-EVP deflation."""

import numpy as np
import jax.numpy as jnp

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.dense import DenseSchwarz
from hpddm_tpu.solvers.gmres import gmres


def _setup(S=4, Nx=30, Ny=30, **opt_kwargs):
    gen = diffusion2d.generate(S, Nx, Ny, overlap=1)
    blocks = [m.dense() for m in gen.mats]
    opt = Options(**opt_kwargs)
    ds = DenseSchwarz(blocks, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
    f = np.zeros((S, ds.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    return gen, ds, jnp.asarray(f)


def test_dense_one_level():
    gen, ds, f = _setup()
    op = ds.build()
    res = gmres(op, f, tol=1e-8, restart=60, max_it=200)
    r = f - op.gmv(res.x)
    rel = float(jnp.sqrt(jnp.sum(ds.dec.d[:, :, None] * r ** 2))
                / jnp.sqrt(jnp.sum(ds.dec.d[:, :, None] * f ** 2)))
    assert rel < 1e-6
    assert int(res.iterations) <= 60


def test_dense_user_gmv_and_evp():
    """User GMV closure + standard-EVP coarse space."""
    gen, ds0, f = _setup()
    # user gmv: same operator but supplied externally
    inner = DenseSchwarz([m.dense() for m in gen.mats], gen.neighbors,
                         gen.mappings, d=gen.d)
    opt = Options(schwarz_coarse_correction="deflated", geneo_nu=5)
    ds = DenseSchwarz([m.dense() for m in gen.mats], gen.neighbors,
                      gen.mappings, d=gen.d, options=opt,
                      user_gmv=lambda x: inner.gmv(x))
    ds.solve_evp()
    op = ds.build()
    res = gmres(op, f, tol=1e-8, restart=60, max_it=200)
    r = f - op.gmv(res.x)
    rel = float(jnp.sqrt(jnp.sum(ds.dec.d[:, :, None] * r ** 2))
                / jnp.sqrt(jnp.sum(ds.dec.d[:, :, None] * f ** 2)))
    assert rel < 1e-6
