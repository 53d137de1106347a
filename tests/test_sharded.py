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


@pytest.mark.parametrize("coarse", ["dense", "mfree", "cheby"])
def test_sharded_substructure(coarse):
    """FETI and BDD under shard_map must match the batched solve — the
    coarse scatters use *global* column offsets (kern_off / sub_gid), so
    per-shard slices stay correct."""
    from hpddm_tpu.models import nonoverlap
    from hpddm_tpu.parallel.mesh import (make_mesh, shard_substructure,
                                         sharded_bdd_solve,
                                         sharded_feti_solve)
    from hpddm_tpu.precond.substructure import (Substructure, bdd_solve,
                                                feti_solve)

    S, n_dev = 4, 4
    gen = nonoverlap.generate(S, 20, 20)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings,
                       options=Options(substructuring_coarse=coarse))
    st = sub.state
    f = np.zeros((S, sub.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s], 0] = gen.f[s]
    f = jnp.asarray(f)

    ref_feti = feti_solve(st, f, tol=1e-9, max_it=200)
    ref_bdd = bdd_solve(st, f, tol=1e-9, max_it=200)

    mesh = make_mesh(n_dev)
    st_sh = shard_substructure(st, mesh)
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("sub", None, None)))

    res_f = sharded_feti_solve(st_sh, f_sh, mesh, tol=1e-9, max_it=200)
    assert abs(int(res_f.iterations) - int(ref_feti.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res_f.u), np.asarray(ref_feti.u),
                               atol=1e-8)

    res_b = sharded_bdd_solve(st_sh, f_sh, mesh, tol=1e-9, max_it=200)
    assert abs(int(res_b.iterations) - int(ref_bdd.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res_b.u), np.asarray(ref_bdd.u),
                               atol=1e-8)


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


def test_sharded_banded_local_solver():
    """Schwarz with -hpddm_local_solver banded under shard_map: the
    (wy, S, ...) factor pspecs must shard (not replicate) and match the
    batched iterates."""
    S, n_dev, Nx = 4, 4, 48
    gen = diffusion2d.generate_uniform(S, Nx, Nx, overlap=1)
    opt = Options(tol=1e-8, max_it=200, local_solver="banded")
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    sch.set_grid_geometry(gen.boxes, Nx, Nx)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = sch.exchange_rhs(jnp.asarray(f))
    state = sch.build()
    res_ref = solve(state, f, opt=opt)

    mesh = make_mesh(n_dev)
    state_sh = shard_state(state, mesh)
    assert state_sh.solver.Dinv.sharding.spec[1] == "sub"
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("sub", None, None)))
    res_sh = sharded_solve(state_sh, f_sh, opt, mesh)
    assert int(res_sh.iterations) == int(res_ref.iterations)
    np.testing.assert_allclose(np.asarray(res_sh.x), np.asarray(res_ref.x),
                               atol=1e-10)


# ---------------------------------------------------------------------------
# Hierarchical 2-D ("host", "sub") mesh (round 4, VERDICT r3 #5): the same
# solves over a 2x4 and a 4x2 mesh must be bitwise those of the batched
# run — inner-axis ppermute halos with outer-axis carry hops
# (parallel/ops._ppermute_shift), coarse/dot collectives spanning both axes.
# ---------------------------------------------------------------------------

AX2 = ("host", "sub")


def _mesh2(shape):
    from hpddm_tpu.parallel.mesh import make_mesh2d
    return make_mesh2d(shape, AX2)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_mesh2d_matches_batched(shape):
    S = 8
    gen, sch, f = _setup(S)
    state = sch.build()
    res_ref = solve(state, f, opt=sch.opt)

    mesh = _mesh2(shape)
    state_sh = shard_state(state, mesh, axis=AX2)
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(AX2, None, None)))
    res_sh = sharded_solve(state_sh, f_sh, sch.opt, mesh, axis=AX2)
    assert int(res_sh.iterations) == int(res_ref.iterations)
    np.testing.assert_allclose(np.asarray(res_sh.x), np.asarray(res_ref.x),
                               atol=1e-10)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_mesh2d_two_level_grid_banded(shape):
    """Two-level GenEO + banded locals + the *grid* (slab-halo) exchange
    over the 2-D mesh: exercises _global_row_shift's carry resolution
    (ppermute across the host axis) and the tuple-axis coarse psum."""
    S, Nx = 8, 48
    gen = diffusion2d.generate_uniform(S, Nx, Nx, overlap=1,
                                       with_neumann=True)
    opt = Options(tol=1e-8, max_it=200, local_solver="banded",
                  schwarz_coarse_correction="deflated", geneo_nu=4)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    sch.set_grid_geometry(gen.boxes, Nx, Nx)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = sch.exchange_rhs(jnp.asarray(f))
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    res_ref = solve(state, f, opt=opt)

    mesh = _mesh2(shape)
    state_sh = shard_state(state, mesh, axis=AX2)
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(AX2, None, None)))
    res_sh = sharded_solve(state_sh, f_sh, opt, mesh, axis=AX2)
    assert int(res_sh.iterations) == int(res_ref.iterations)
    np.testing.assert_allclose(np.asarray(res_sh.x), np.asarray(res_ref.x),
                               atol=1e-10)


def test_mesh2d_substructure_bdd():
    """BDD under the 2-D mesh matches the batched solve."""
    from hpddm_tpu.models import nonoverlap
    from hpddm_tpu.parallel.mesh import (shard_substructure,
                                         sharded_bdd_solve)
    from hpddm_tpu.precond.substructure import Substructure, bdd_solve

    S = 4
    gen = nonoverlap.generate(S, 20, 20)
    sub = Substructure(gen.mats, gen.neighbors, gen.mappings,
                       options=Options())
    st = sub.state
    f = np.zeros((S, sub.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s], 0] = gen.f[s]
    f = jnp.asarray(f)
    ref = bdd_solve(st, f, tol=1e-9, max_it=200)

    mesh = _mesh2((2, 2))
    st_sh = shard_substructure(st, mesh, axis=AX2)
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(AX2, None, None)))
    res = sharded_bdd_solve(st_sh, f_sh, mesh, axis=AX2, tol=1e-9,
                            max_it=200)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               atol=1e-8)
