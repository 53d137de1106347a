"""Feature coverage: enlarged Krylov, mixed-precision coarse operator,
reuse_preconditioner, statistics, dump/reload solve (solver.py analogue)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
from hpddm_tpu.solvers.krylov import solve


def _setup(S, Nx=40, Ny=40, with_neumann=False, **opt_kwargs):
    gen = diffusion2d.generate(S, Nx, Ny, overlap=1,
                               with_neumann=with_neumann)
    opt = Options(**opt_kwargs)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d, options=opt)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    return gen, sch, jnp.asarray(f)


def test_enlarged_krylov():
    S = 4
    gen, sch, f = _setup(S, enlarge_krylov_subspace=4)
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) <= 1e-2
    # plain solve for comparison: enlarged must converge too and produce
    # the same solution to tolerance
    opt2 = Options()
    res2 = solve(state, f, opt=opt2)
    assert np.allclose(np.asarray(res.x), np.asarray(res2.x), atol=1e-3)


def test_mixed_precision_coarse():
    """HPDDM_MIXED_PRECISION analogue: coarse operator in float32 within an
    f64 solve; oracle relaxes to 60 iterations (schwarz.cpp:140)."""
    S = 4
    gen, sch, f = _setup(S, Nx=100, Ny=100, with_neumann=True,
                         schwarz_coarse_correction="deflated", geneo_nu=10,
                         coarse_dtype="float32")
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    assert state.coarse.E_inv.dtype == jnp.float32
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert int(res.iterations) <= 60
    assert float(nr[0] / nb[0]) <= 1e-2


def test_reuse_preconditioner():
    S = 4
    gen, sch, f = _setup(S, reuse_preconditioner=1)
    state1 = sch.build()
    res1 = solve(state1, f, opt=sch.opt)
    # perturb the matrices slightly and reuse the factorization
    new_mats = []
    from hpddm_tpu.core.csr import MatrixCSR
    for m in gen.mats:
        c = m.scipy().copy()
        c = c * 1.001
        new_mats.append(MatrixCSR(c))
    sch.update_matrices(new_mats)
    state2 = sch.build()
    # same factorization object reused
    assert state2.solver is state1.solver
    res2 = solve(state2, f, opt=sch.opt)
    nb, nr = compute_residual(state2, res2.x, f)
    assert float(nr[0] / nb[0]) <= 1e-2


def test_statistics():
    S = 4
    gen, sch, f = _setup(S)
    txt = sch.statistics()
    assert "4 subdomains" in txt
    assert "1600" in txt  # 40*40 unique unknowns


def test_dump_reload_single_domain(tmp_path):
    """The solver.py / iterative.py workflow: dump local matrix, reload,
    re-solve single-domain (dump/reload acts as the serialization test)."""
    from hpddm_tpu.core.csr import MatrixCSR
    from hpddm_tpu.solvers.base import LinearOperator
    from hpddm_tpu.solvers.gmres import gmres
    gen = diffusion2d.generate(1, 30, 30)
    m = gen.mats[0]
    path = str(tmp_path / "dump.txt")
    m.dump(path)
    back = MatrixCSR.from_file(path)
    assert back.nnz == m.nnz
    Ad = jnp.asarray(back.dense())
    diag = jnp.asarray(1.0 / back.scipy().diagonal())
    op = LinearOperator(gmv=lambda x: jnp.einsum("nk,skm->snm", Ad, x),
                        apply=lambda x: diag[None, :, None] * x)
    b = jnp.asarray(gen.f[0].reshape(1, -1, 1))
    res = gmres(op, b, tol=1e-8, restart=50, max_it=300)
    r = np.asarray(b - op.gmv(res.x))
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
    assert rel < 1e-6


def test_csr_restriction_and_same_sparsity():
    from hpddm_tpu.core.csr import MatrixCSR
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    A = MatrixCSR(sp.random(30, 30, density=0.2, format="csr",
                            random_state=1) + sp.identity(30))
    idx = np.array([0, 3, 5, 7, 11, 20])
    R = A.restriction(idx)
    np.testing.assert_allclose(R.dense(), A.dense()[np.ix_(idx, idx)])
    B = MatrixCSR(A.scipy() * 2.0)
    assert A.same_sparsity(B)
    A.update_values(B)
    np.testing.assert_allclose(A.dense(), B.dense())


def test_bfloat16_coarse():
    """bf16 coarse operator still converges within the relaxed cap."""
    S = 4
    gen, sch, f = _setup(S, Nx=60, Ny=60, with_neumann=True,
                         schwarz_coarse_correction="deflated", geneo_nu=6,
                         coarse_dtype="bfloat16")
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    assert str(state.coarse.E_inv.dtype) == "bfloat16"
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert int(res.iterations) <= 60
    assert float(nr[0] / nb[0]) <= 1e-2


def test_geneo_estimate_nu():
    """-hpddm_geneo_estimate_nu sizes the coarse space by the threshold
    count (HPDDM_schwarz.hpp:686-703) — nu can exceed geneo_nu."""
    import numpy as np
    import jax.numpy as jnp
    from hpddm_tpu.models import diffusion2d
    from hpddm_tpu.options import Options
    from hpddm_tpu.precond.schwarz import Schwarz

    S = 4
    gen = diffusion2d.generate(S, 40, 40, overlap=1, with_neumann=True)
    opt = Options(schwarz_coarse_correction="deflated", geneo_nu=2,
                  geneo_threshold=0.4, geneo_estimate_nu=1)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    nu_est = sch.solve_gevp(gen.neumann)
    opt2 = Options(schwarz_coarse_correction="deflated", geneo_nu=2,
                   geneo_threshold=0.4)
    sch2 = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                   options=opt2)
    nu_plain = sch2.solve_gevp(gen.neumann)
    # without the estimate, geneo_nu caps the count at 2; with it, the
    # threshold population is taken in full
    assert int(np.max(nu_plain)) <= 2
    assert int(np.max(nu_est)) > 2, (nu_est, nu_plain)
