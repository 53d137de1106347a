"""DST fast-Poisson local solver (-hpddm_local_solver fft): exactness on
separable blocks, oracle parity on the reference problem, and the
large-subdomain regime dense factorization cannot reach."""

import numpy as np
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
from hpddm_tpu.solvers.krylov import solve
from hpddm_tpu.ops.fft_solve import dst1, build_fft_solver


def test_dst1_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 17)))
    y = dst1(dst1(x)) * (2.0 / (17 + 1))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-12)


def test_fft_exact_on_separable_block():
    """Single domain: the local matrix IS the 5-point Dirichlet stencil
    (voff == wx), so the DST solve is exact."""
    gen = diffusion2d.generate(1, 24, 24, overlap=1)
    solver = build_fft_solver(gen.boxes, 24, 24, gen.n_loc[0],
                              dtype=jnp.float64)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=(1, gen.n_loc[0], 1)))
    x = solver.solve(b)
    r = np.asarray(b)[0, :, 0] - gen.mats[0].scipy() @ np.asarray(x)[0, :, 0]
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-10


def test_fft_ras_oracle():
    """FFT-RAS on the 100x100 oracle: approximate local solves still meet
    the reference's 45-iteration cap (38 vs 30 for exact inverses)."""
    S = 4
    gen = diffusion2d.generate(S, 100, 100, overlap=1)
    opt = Options(local_solver="fft")
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    sch.set_grid_geometry(gen.boxes, 100, 100)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    state = sch.build()
    res = solve(state, jnp.asarray(f), opt=opt)
    nb, nr = compute_residual(state, res.x, jnp.asarray(f))
    assert int(res.iterations) <= 45
    assert float(nr[0] / nb[0]) < 1e-2


def test_fft_large_subdomains_two_level():
    """256x256 with 17k-dof subdomains + constant-vector coarse: no
    factorization memory at all."""
    S = 4
    gen = diffusion2d.generate(S, 256, 256, overlap=1)
    opt = Options(local_solver="fft", tol=1e-8, max_it=300,
                  gmres_restart=100,
                  schwarz_coarse_correction="deflated", geneo_nu=0)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    sch.set_grid_geometry(gen.boxes, 256, 256)
    sch.set_vectors([np.ones((m.n, 1)) for m in gen.mats])
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    state = sch.build()
    res = solve(state, jnp.asarray(f), opt=opt)
    nb, nr = compute_residual(state, res.x, jnp.asarray(f))
    assert float(nr[0] / nb[0]) < 1e-6
    assert bool(np.asarray(res.converged).all())


def test_lanczos_geneo_matches_dense_quality():
    """Matrix-free (shift-invert Lanczos) GenEO on a small case: close to
    the dense-pencil coarse space (21 vs 15 its; one-level ~30)."""
    S = 4
    gen = diffusion2d.generate(S, 60, 60, overlap=1, with_neumann=True)
    its = {}
    for method in ("dense", "lanczos"):
        opt = Options(schwarz_coarse_correction="deflated", geneo_nu=6)
        sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        sch.solve_gevp(gen.neumann, method=method)
        state = sch.build()
        f = np.zeros((S, sch.n_max, 1))
        for s in range(S):
            f[s, : gen.n_loc[s]] = gen.f[s]
        res = solve(state, jnp.asarray(f), opt=opt)
        nb, nr = compute_residual(state, res.x, jnp.asarray(f))
        assert float(nr[0] / nb[0]) < 1e-2
        its[method] = int(res.iterations)
    assert its["lanczos"] <= its["dense"] + 10, its


def test_dst_matmul_matches_fft():
    """DSTMatmulSolver (uniform masked sine matmuls) must reproduce the
    grouped-rFFT solver to machine precision on mixed box sizes."""
    gen = diffusion2d.generate(4, 100, 100, overlap=2)
    n_max = max(gen.n_loc)
    fft = build_fft_solver(gen.boxes, 100, 100, n_max,
                           dtype=jnp.float64, mode="fft")
    mm = build_fft_solver(gen.boxes, 100, 100, n_max,
                          dtype=jnp.float64, mode="matmul")
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(4, n_max, 2)))
    np.testing.assert_allclose(np.asarray(mm.solve(b)),
                               np.asarray(fft.solve(b)),
                               rtol=0.0, atol=1e-12)


def test_fft_solver_sharded():
    """The matmul-DST solver's leaves are all S-leading, so the FFT local
    solve runs under shard_map; sharded == batched."""
    import jax as _jax
    from hpddm_tpu.parallel.mesh import make_mesh, shard_state, sharded_solve
    from hpddm_tpu.solvers.krylov import solve as _solve
    S = 4
    gen = diffusion2d.generate(S, 100, 100, overlap=1)
    opt = Options(local_solver="fft", tol=1e-6)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    sch.set_grid_geometry(gen.boxes, 100, 100)
    state = sch.build()
    assert type(state.solver).__name__ == "DSTMatmulSolver"
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = jnp.asarray(f)
    res_ref = _solve(state, f, opt=opt)
    nb, nr = compute_residual(state, res_ref.x, f)
    assert float(nr[0] / nb[0]) <= 1e-2

    mesh = make_mesh(4)
    state_sh = shard_state(state, mesh)
    f_sh = _jax.device_put(f, _jax.sharding.NamedSharding(
        mesh, _jax.sharding.PartitionSpec("sub", None, None)))
    res_sh = sharded_solve(state_sh, f_sh, opt, mesh)
    assert int(res_sh.iterations) == int(res_ref.iterations)
    # not bitwise: XLA tiles the batched DST einsums differently for the
    # per-shard batch size (the solver *application* is bitwise equal;
    # verified directly), so allow last-digit drift
    np.testing.assert_allclose(np.asarray(res_sh.x), np.asarray(res_ref.x),
                               rtol=0.0, atol=1e-10)
