"""Symmetric Jacobi scaling (core/scaling.py) — the f32 enabler.

At coefficient contrast 1e4, cond(A_loc) ~ contrast x grid-cond and *any*
f32 local factorization is meaningless (measured: one-level RAS with exact
inverses stalls at relres 5e-2). Scaling A~ = S A S with S = diag(A)^-1/2
removes the coefficient magnitude; these tests pin the algebra and the
f32 recovery.
"""

import numpy as np
import jax.numpy as jnp

from hpddm_tpu.core.scaling import jacobi_scale, unscale_solution
from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
from hpddm_tpu.solvers.krylov import solve


def _kappa(xx, yy):
    return (np.where((yy > 3.3) & (yy < 6.6), 1.0e4, 1.0)
            * np.where(xx > 5.0, 10.0, 1.0))


def test_scaled_system_solution_maps_back():
    # single domain: solve S A S x~ = S b, check A (S x~) = b
    gen = diffusion2d.generate_uniform(1, 48, 48, kappa=_kappa)
    mats, f_s, _, s_list = jacobi_scale(gen.mats, gen.f)
    A_sc = mats[0].scipy(expand=True).toarray()
    np.testing.assert_allclose(np.diag(A_sc), 1.0, rtol=1e-12)
    import numpy.linalg as la
    xt = la.solve(A_sc, f_s[0][:, 0])
    x = unscale_solution(xt[None, :, None], s_list)[0, :, 0]
    A = gen.mats[0].scipy(expand=True).toarray()
    r = gen.f[0][:, 0] - A @ x
    assert la.norm(r) / la.norm(gen.f[0][:, 0]) < 1e-10


def test_f32_contrast_1e4_needs_scaling():
    # unscaled f32 stalls; scaled f32 converges — both with exact local
    # inverses, so this pins the conditioning argument, not the solver
    S, Nx, Ny = 4, 96, 96
    dtype = np.float32
    gen = diffusion2d.generate_uniform(S, Nx, Ny, overlap=1, kappa=_kappa,
                                       dtype=dtype)

    def run(mats, f_list):
        opt = Options(tol=1e-6, max_it=60)
        sch = Schwarz(mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        sch.set_grid_geometry(gen.boxes, Nx, Ny)
        state = sch.build()
        f = np.zeros((S, sch.n_max, 1), dtype=dtype)
        for s in range(S):
            f[s, : gen.n_loc[s]] = f_list[s]
        f = jnp.asarray(f)
        res = solve(state, f, opt=opt)
        rr = np.array(compute_residual(state, res.x, f)).ravel()[-1]
        return int(res.iterations), float(rr)

    its_u, rr_u = run(gen.mats, gen.f)
    mats, f_s, _, _ = jacobi_scale(gen.mats, gen.f)
    its_s, rr_s = run(mats, f_s)
    assert rr_u > 1e-3          # unscaled f32: stuck at the cond floor
    assert rr_s < 1e-3          # scaled f32: converges
    assert its_s < 60


def test_geneo_pencil_scaling_consistency():
    # scaling both pencil matrices is a congruence: GenEO eigenvalues are
    # invariant, so iteration counts with/without scaling match in f64
    S, Nx, Ny = 4, 64, 64
    gen = diffusion2d.generate_uniform(S, Nx, Ny, overlap=1, kappa=_kappa,
                                       with_neumann=True)

    def run(mats, f_list, neu):
        opt = Options(tol=1e-8, schwarz_coarse_correction="deflated",
                      geneo_nu=8)
        sch = Schwarz(mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        sch.set_grid_geometry(gen.boxes, Nx, Ny)
        sch.solve_gevp(neu)
        state = sch.build()
        f = np.zeros((S, sch.n_max, 1))
        for s in range(S):
            f[s, : gen.n_loc[s]] = f_list[s]
        res = solve(state, jnp.asarray(f), opt=opt)
        return int(res.iterations)

    its_u = run(gen.mats, gen.f, gen.neumann)
    mats, f_s, neu, _ = jacobi_scale(gen.mats, gen.f, gen.neumann)
    its_s = run(mats, f_s, neu)
    assert abs(its_s - its_u) <= 3
