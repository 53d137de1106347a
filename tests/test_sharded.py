"""Sharded (multi-device) execution tests on the virtual 8-CPU mesh —
the analogue of the reference's np in {1,2,4,5} mpirun sweeps
(Makefile:279-389), plus bitwise-vs-batched consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.parallel.mesh import make_mesh, shard_state, sharded_solve
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
from hpddm_tpu.solvers.krylov import solve


def _setup(S, Nx=48, Ny=48, **opt_kwargs):
    gen = diffusion2d.generate(S, Nx, Ny, overlap=1, with_neumann=True)
    opt = Options(**opt_kwargs)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d, options=opt)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    return gen, sch, jnp.asarray(f)


@pytest.mark.parametrize("n_dev,S", [(2, 2), (4, 4), (8, 8), (4, 8)])
def test_sharded_matches_batched(n_dev, S):
    """Same problem solved batched (1 device) and sharded must agree."""
    gen, sch, f = _setup(S)
    state = sch.build()
    res_ref = solve(state, f, opt=sch.opt)

    mesh = make_mesh(n_dev)
    state_sh = shard_state(state, mesh)
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("sub", None, None)))
    res_sh = sharded_solve(state_sh, f_sh, sch.opt, mesh)

    assert int(res_sh.iterations) == int(res_ref.iterations)
    np.testing.assert_allclose(np.asarray(res_sh.x), np.asarray(res_ref.x),
                               atol=1e-10)


def test_sharded_two_level():
    S, n_dev = 4, 4
    gen, sch, f = _setup(S, schwarz_coarse_correction="deflated", geneo_nu=4)
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    res_ref = solve(state, f, opt=sch.opt)

    mesh = make_mesh(n_dev)
    state_sh = shard_state(state, mesh)
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("sub", None, None)))
    res_sh = sharded_solve(state_sh, f_sh, sch.opt, mesh)
    assert int(res_sh.iterations) == int(res_ref.iterations)
    nb, nr = compute_residual(state, jnp.asarray(np.asarray(res_sh.x)), f)
    assert float(nr[0] / nb[0]) < 1e-2
