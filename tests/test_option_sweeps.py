"""Option-sweep coverage mirroring the reference's make-test matrix
(Makefile:279-389): orthogonalization, variants, thresholds,
force-uniformity, residual norms, history, level-2 options."""

import numpy as np
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
from hpddm_tpu.solvers.krylov import solve


def _setup(S=4, Nx=40, Ny=40, with_neumann=False, **kw):
    gen = diffusion2d.generate(S, Nx, Ny, overlap=1,
                               with_neumann=with_neumann)
    opt = Options(**kw)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d, options=opt)
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    return gen, sch, jnp.asarray(f)


@pytest.mark.parametrize("ortho", ["cgs", "mgs"])
@pytest.mark.parametrize("variant", ["left", "right", "flexible"])
def test_variant_ortho_sweep(ortho, variant):
    gen, sch, f = _setup(orthogonalization=ortho, variant=variant)
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) < 1e-2
    assert int(res.iterations) <= 45


def test_flexible_two_level():
    gen, sch, f = _setup(with_neumann=True, variant="flexible",
                         schwarz_coarse_correction="deflated", geneo_nu=4)
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) < 1e-2


def test_geneo_threshold_and_uniformity():
    """-hpddm_geneo_threshold 0.2 -hpddm_geneo_force_uniformity min|max
    (Makefile:344-351)."""
    for uni in ("min", "max"):
        gen, sch, f = _setup(S=5, with_neumann=True,
                             schwarz_coarse_correction="deflated",
                             geneo_nu=8, geneo_threshold=0.2,
                             geneo_force_uniformity=uni)
        nu_loc = sch.solve_gevp(gen.neumann)
        assert len(set(int(v) for v in nu_loc)) == 1, (uni, nu_loc)
        state = sch.build()
        res = solve(state, f, opt=sch.opt)
        nb, nr = compute_residual(state, res.x, f)
        assert float(nr[0] / nb[0]) < 1e-2


@pytest.mark.parametrize("norm", ["l2", "l1", "linfty"])
def test_compute_residual_norms(norm):
    gen, sch, f = _setup()
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f, norm=norm)
    assert float(nr[0]) < float(nb[0])
    assert np.isfinite(float(nb[0]))


def test_history_monotone_tail():
    gen, sch, f = _setup()
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    h = np.asarray(res.history)[:, 0]
    valid = h[h >= 0]
    assert len(valid) >= int(res.iterations)
    # GMRES residual estimates are non-increasing
    assert np.all(np.diff(valid) <= 1e-12)


def test_level2_options_accepted():
    """level_2_p / topology / distribution accepted for compatibility."""
    gen, sch, f = _setup(with_neumann=True,
                         schwarz_coarse_correction="deflated", geneo_nu=4)
    sch.opt["level_2_p"] = 2
    sch.opt["level_2_topology"] = "1"
    sch.opt["level_2_distribution"] = "sol"
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) < 1e-2


def test_inexact_coarse_level2_krylov():
    """HPDDM_INEXACT_COARSE_OPERATOR analogue: nested coarse Krylov."""
    gen, sch, f = _setup(with_neumann=True,
                         schwarz_coarse_correction="deflated", geneo_nu=6)
    sch.opt["level_2_krylov_method"] = "cg"
    sch.opt["level_2_tol"] = 1e-3
    sch.opt["level_2_max_it"] = 30
    sch.solve_gevp(gen.neumann)
    state = sch.build()
    assert state.coarse.mode == "iterative"
    res = solve(state, f, opt=sch.opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) < 1e-2
    assert int(res.iterations) <= 60


def test_version_text():
    txt = Options.version_text()
    assert "hpddm_tpu" in txt


def test_object_prefix():
    """Per-object prefixes: -hpddm_myprefix_* overrides for one operator
    (the -prefix=myPrefix_ sweep of the reference's make test)."""
    gen, sch, f = _setup()
    sch.opt["my_schwarz_method"] = "asm"
    sch.opt["my_tol"] = 1e-4
    sch.prefix = "my_"
    state = sch.build()
    assert state.variant == "asm"
    res = solve(state, f, opt=sch.opt, prefix="my_")
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) < 1e-2


@pytest.mark.parametrize("qr", ["cholqr", "cgs", "mgs"])
def test_qr_sweep_block_methods(qr):
    """-hpddm_qr (cholqr | cgs | mgs): the distributed QR variants
    (HPDDM_iterative.hpp:559-666) must all drive the block solvers to the
    same solution."""
    gen, sch, f = _setup()
    rng = np.random.default_rng(7)
    fm = jnp.asarray(np.concatenate(
        [np.asarray(f)] + [np.asarray(f) * 0 + rng.normal(
            size=np.asarray(f).shape) for _ in range(2)], axis=2))
    fm = sch.exchange_rhs(fm)   # random RHS must be consistent on overlaps
    sols = {}
    for method in ("bgmres", "bfbcg"):
        sch.opt["krylov_method"] = method
        sch.opt["qr"] = qr
        sch.opt["tol"] = 1e-9
        sch.opt["max_it"] = 300
        state = sch.build()
        res = solve(state, fm, opt=sch.opt)
        nb, nr = compute_residual(state, res.x, fm)
        assert float(np.max(np.asarray(nr) / np.asarray(nb))) < 1e-6, (
            method, qr)
        sols[method] = np.asarray(res.x)
    np.testing.assert_allclose(sols["bgmres"], sols["bfbcg"],
                               rtol=1e-5, atol=1e-7)


def test_cgs2_orthogonalization():
    """cgs2 (iterated CGS, the f32 default) converges and matches mgs
    iteration counts on the oracle problem."""
    its = {}
    for ortho in ("cgs2", "mgs"):
        gen, sch, f = _setup(orthogonalization=ortho)
        state = sch.build()
        res = solve(state, f, opt=sch.opt)
        nb, nr = compute_residual(state, res.x, f)
        assert float(nr[0] / nb[0]) < 1e-2, ortho
        its[ortho] = int(res.iterations)
    assert abs(its["cgs2"] - its["mgs"]) <= 2, its
