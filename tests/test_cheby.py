"""Inexact Chebyshev local solves (ops/cheby_solve.py).

The reference's local solves are exact sparse direct factorizations; the
Chebyshev path is the TPU-native inexact alternative for large
heterogeneous subdomains (no O(n^2) factor memory). Oracles: the outer
GMRES iteration count with DST-preconditioned Chebyshev local solves must
stay close to the exact-inverse count, and far under the reference's
45-iteration cap (examples/schwarz.cpp:140).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
from hpddm_tpu.solvers.krylov import solve


def _kappa(xx, yy):
    # high-permeability channel + quadrant jump, contrast 1e4
    return (np.where((yy > 3.3) & (yy < 6.6), 1.0e4, 1.0)
            * np.where(xx > 5.0, 10.0, 1.0))


def _setup(local_solver, S=4, Nx=128, Ny=128, kappa=_kappa, steps=24):
    gen = diffusion2d.generate_uniform(S, Nx, Ny, overlap=1, kappa=kappa)
    opt = Options(tol=1e-8, local_solver=local_solver,
                  local_cheby_steps=steps)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    sch.set_grid_geometry(gen.boxes, Nx, Ny)
    state = sch.build()
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    return state, jnp.asarray(f), opt


def test_dst_cheby_matches_exact_inverse_iterations():
    state_i, f, opt_i = _setup("inv")
    res_i = solve(state_i, f, opt=opt_i)
    state_c, f, opt_c = _setup("dst_cheby")
    res_c = solve(state_c, f, opt=opt_c)
    its_i, its_c = int(res_i.iterations), int(res_c.iterations)
    rr = np.array(compute_residual(state_c, res_c.x, f)).ravel()[-1]
    # true-residual bound loosened for the contrast-1e4 conditioning
    assert rr < 1e-5
    # inexact local solves may cost a few extra outer iterations, no more
    assert its_c <= its_i + 5
    assert its_c <= 45          # the reference's oracle cap


def test_jacobi_cheby_converges():
    # moderate contrast for the Jacobi-preconditioned variant
    state, f, opt = _setup(
        "cheby", steps=32,
        kappa=lambda xx, yy: np.where((yy > 3.3) & (yy < 6.6), 100.0, 1.0))
    res = solve(state, f, opt=opt)
    rr = np.array(compute_residual(state, res.x, f)).ravel()[-1]
    assert bool(np.all(np.array(res.converged)))
    assert rr < 1e-6


def test_geneo_with_cheby_local_solves():
    # the flagship production config: large heterogeneous subdomains,
    # two-level GenEO coarse space (Lanczos GEVP with inner-CG applies
    # preconditioned by the DST), inexact Chebyshev local solves
    S, Nx, Ny = 4, 128, 128
    gen = diffusion2d.generate_uniform(S, Nx, Ny, overlap=1, kappa=_kappa,
                                       with_neumann=True)
    opt = Options(tol=1e-8, local_solver="dst_cheby", local_cheby_steps=24,
                  schwarz_coarse_correction="deflated", geneo_nu=12)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    sch.set_grid_geometry(gen.boxes, Nx, Ny)
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = jnp.asarray(f)
    res = solve(state, f, opt=opt)
    rr = np.array(compute_residual(state, res.x, f)).ravel()[-1]
    assert rr < 1e-6
    assert int(res.iterations) <= 25      # measured 18; exact-inv 2lvl: 10


def test_uniform_neumann_matrices_are_spsd():
    gen = diffusion2d.generate_uniform(4, 64, 64, overlap=1, kappa=_kappa,
                                       with_neumann=True)
    for m in gen.neumann:
        A = m.scipy(expand=True).toarray()
        w = np.linalg.eigvalsh(A)
        assert w[0] > -1e-8 * abs(w[-1])


def test_cheby_solver_is_linear():
    # fixed-coefficient Chebyshev is a *linear* operator: plain
    # (non-flexible) GMRES stays valid, unlike inner-Krylov local solves
    state, f, _ = _setup("dst_cheby")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=f.shape))
    y = jnp.asarray(rng.normal(size=f.shape))
    a, b = 1.7, -0.4
    lhs = state.solver.solve(a * x + b * y)
    rhs = a * state.solver.solve(x) + b * state.solver.solve(y)
    np.testing.assert_allclose(np.array(lhs), np.array(rhs),
                               rtol=1e-10, atol=1e-12)


def test_kappa_none_reproduces_constant_stencil():
    gen_k = diffusion2d.generate_uniform(4, 64, 64, overlap=1, kappa=None)
    gen_0 = diffusion2d.generate_uniform(4, 64, 64, overlap=1)
    for mk, m0 in zip(gen_k.mats, gen_0.mats):
        np.testing.assert_array_equal(mk.a, m0.a)
        np.testing.assert_array_equal(mk.ja, m0.ja)


def test_heterogeneous_operator_is_symmetric():
    gen = diffusion2d.generate_uniform(1, 48, 48, kappa=_kappa)
    A = gen.mats[0].scipy(expand=True)
    assert abs(A - A.T).max() < 1e-12


def test_cheby_requires_geometry_for_dst():
    gen = diffusion2d.generate(4, 60, 60, overlap=1)
    opt = Options(local_solver="dst_cheby")
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    with pytest.raises(ValueError, match="set_grid_geometry"):
        sch.build()
