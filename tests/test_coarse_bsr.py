"""Block-sparse coarse operator (-hpddm_coarse_assembly bsr): the
neighbor-block assembly (the reference's sparsity pattern 's',
HPDDM_operator.hpp:378-562) must match the dense Galerkin product block
by block, and the block-sparse nested coarse solves must preserve the
two-level convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
from hpddm_tpu.solvers.krylov import solve


def _setup(S=4, Nx=40, Ny=40, **kw):
    gen = diffusion2d.generate(S, Nx, Ny, overlap=1, with_neumann=True)
    opt = Options(**kw)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d, options=opt)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    return gen, sch, jnp.asarray(f)


def _assert_blocks_match(sch, atol_scale=1e-10):
    """Build dense-iterative and bsr coarse states; compare block-wise."""
    sch.opt["level_2_krylov_method"] = "cg"   # dense-iterative keeps E
    sch.opt["coarse_assembly"] = "dense"
    state_d = sch.build()
    E = np.asarray(state_d.coarse.E)

    sch.opt["coarse_assembly"] = "bsr"
    state_b = sch.build()
    co = state_b.coarse
    assert co.mode == "bsr"
    S = sch.dec.S
    nu = co.nu_max
    Eb_diag = np.asarray(co.Eb_diag)
    Eb_nbr = np.asarray(co.Eb_nbr)
    oh = np.asarray(co.nbr_oh)
    blocks = E.reshape(S, nu, S, nu)
    scale = np.abs(E).max()
    for s in range(S):
        np.testing.assert_allclose(Eb_diag[s], blocks[s, :, s, :],
                                   atol=atol_scale * scale)
        seen = set()
        for j in range(oh.shape[1]):
            q = int(np.argmax(oh[s, j]))
            if oh[s, j, q] == 0 or q >= S:
                continue
            seen.add(q)
            np.testing.assert_allclose(Eb_nbr[s, j], blocks[s, :, q, :],
                                       atol=atol_scale * scale)
        # blocks for non-neighbors must vanish in the dense E
        for q in range(S):
            if q != s and q not in seen:
                assert np.abs(blocks[s, :, q, :]).max() < atol_scale * scale


def test_bsr_blocks_match_dense_E():
    """E_diag / E_nbr must equal the corresponding blocks of the dense
    Galerkin matrix E = Z^T A Z."""
    gen, sch, f = _setup(schwarz_coarse_correction="deflated", geneo_nu=4)
    sch.solve_gevp(gen.neumann)
    _assert_blocks_match(sch)


def test_bsr_blocks_complex_helmholtz():
    """Complex scalars: the conjugations in the slab assembly must match
    the dense Galerkin product (E is complex-symmetric, not Hermitian)."""
    from hpddm_tpu.models import helmholtz
    S = 4
    gen = helmholtz.generate(S, Nx=24, Ny=24, k=4.0, eps=0.3)
    opt = Options(schwarz_coarse_correction="deflated")
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    _assert_blocks_match(sch)


@pytest.mark.parametrize("correction", ["deflated", "additive", "balanced"])
def test_bsr_two_level_converges(correction):
    gen, sch, f = _setup(schwarz_coarse_correction=correction, geneo_nu=4,
                         coarse_assembly="bsr")
    sch.opt["level_2_tol"] = 1e-8
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    assert state.coarse.mode == "bsr"
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) < 1e-2
    assert int(res.iterations) <= 45


def test_bsr_matches_dense_iterations():
    """With tight inner tolerance the block-sparse coarse must reproduce
    the dense-direct two-level iteration count (±1)."""
    gen, sch, f = _setup(schwarz_coarse_correction="deflated", geneo_nu=4)
    sch.solve_gevp(gen.neumann)
    state_d = sch.build()
    res_d = solve(state_d, f, opt=sch.opt)

    sch.opt["coarse_assembly"] = "bsr"
    sch.opt["level_2_tol"] = 1e-10
    state_b = sch.build()
    res_b = solve(state_b, f, opt=sch.opt)
    assert abs(int(res_b.iterations) - int(res_d.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res_b.x), np.asarray(res_d.x),
                               rtol=1e-5, atol=1e-8)


def test_bsr_sharded_matches_batched():
    from hpddm_tpu.parallel.mesh import make_mesh, shard_state, sharded_solve
    S = 4
    gen, sch, f = _setup(S=S, schwarz_coarse_correction="deflated",
                         geneo_nu=4, coarse_assembly="bsr")
    sch.opt["level_2_tol"] = 1e-8
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    res_ref = solve(state, f, opt=sch.opt)

    mesh = make_mesh(S)
    state_sh = shard_state(state, mesh)
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("sub", None, None)))
    res_sh = sharded_solve(state_sh, f_sh, sch.opt, mesh)
    assert int(res_sh.iterations) == int(res_ref.iterations)
    np.testing.assert_allclose(np.asarray(res_sh.x), np.asarray(res_ref.x),
                               atol=1e-10)


def test_bsr_nonuniform_nu():
    """np=5-style nonuniform coarse slots through the block-sparse path."""
    gen, sch, f = _setup(S=5, Nx=50, Ny=40,
                         schwarz_coarse_correction="deflated",
                         coarse_assembly="bsr")
    sch.opt["level_2_tol"] = 1e-8
    nus = [2, 4, 3, 5, 4]
    sch.solve_gevp(gen.neumann, nu=nus)
    state = sch.build()
    assert state.coarse.mode == "bsr"
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) < 1e-2
    assert int(res.iterations) <= 45


def test_accumulation_galerkin_matches_multiplication():
    """-hpddm_coarse_galerkin accumulation (the MatrixAccumulation
    counterpart, HPDDM_operator.hpp:563-1021): per-subdomain partial
    overlap contributions additively reduced must reproduce the
    interface-slab (MatrixMultiplication) blocks — both equal the exact
    Galerkin E on the bsr pattern — and the two-level solve must be
    unchanged."""
    import jax.numpy as jnp
    from hpddm_tpu.models import diffusion2d
    from hpddm_tpu.options import Options
    from hpddm_tpu.precond.schwarz import Schwarz
    from hpddm_tpu.solvers.krylov import solve

    S, Nx = 16, 96
    gen = diffusion2d.generate_uniform(S, Nx, Nx, overlap=2,
                                       with_neumann=True)

    def build(galerkin):
        opt = Options(schwarz_coarse_correction="deflated", geneo_nu=3,
                      coarse_assembly="bsr", tol=1e-9)
        opt["coarse_galerkin"] = galerkin
        sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        sch.solve_gevp(gen.neumann)
        return sch, sch.build()

    sch_m, st_m = build("multiplication")
    sch_a, st_a = build("accumulation")
    # no level-2 options -> bsr assembly + replicated direct solve: the
    # two Galerkin algorithms must produce the same inverted E
    np.testing.assert_allclose(np.asarray(st_a.coarse.E_inv),
                               np.asarray(st_m.coarse.E_inv),
                               rtol=1e-8, atol=1e-10)

    f = np.zeros((S, sch_m.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = jnp.asarray(f)
    rm = solve(st_m, f, opt=sch_m.opt)
    ra = solve(st_a, f, opt=sch_a.opt)
    assert int(rm.iterations) == int(ra.iterations)
    np.testing.assert_allclose(np.asarray(ra.x), np.asarray(rm.x),
                               rtol=1e-8, atol=1e-10)


def test_f32_nested_coarse_tol_clamped(capsys):
    """level_2_tol below the f32 nested-coarse floor (~1e-5) is clamped
    with a warning: tighter requests spin the inner solve to max_it and
    the returned noise diverges the deflated outer iteration (measured
    relres 3.0 on chip; PERF.md round 3)."""
    import jax.numpy as jnp
    from hpddm_tpu.models import diffusion2d
    from hpddm_tpu.options import Options
    from hpddm_tpu.precond.schwarz import Schwarz

    def build(npdt):
        gen = diffusion2d.generate_uniform(4, 48, 48, overlap=1,
                                           with_neumann=True, dtype=npdt)
        opt = Options(schwarz_coarse_correction="deflated", geneo_nu=2,
                      coarse_assembly="bsr")
        opt["level_2_tol"] = 1e-8
        sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        sch.solve_gevp(gen.neumann)
        return sch.build()

    assert build(np.float64).coarse.inner_tol == 1e-8   # f64: honored
    assert build(np.float32).coarse.inner_tol == 1e-5   # f32: clamped
    assert "clamped" in capsys.readouterr().out
