"""Matrix-free local substructuring (-hpddm_substructuring_local banded):
FETI/BDD with banded K^+ / implicit Schur applies must reproduce the
dense-local solutions and iteration counts without materializing any
O(n^2) local factor.

Every test in this module runs in a fresh subprocess: after the full
suite has compiled hundreds of programs in-process, the XLA CPU backend
segfaults compiling this module's banded scans (reproducible across
full-suite runs — first seen on the sharded test, later on the plain BDD
comparison as the suite grew; every body passes in isolation). Process
isolation sidesteps the backend bug; bodies are batched per subprocess
so the re-import/compile cost stays bounded."""

import os
import subprocess
import sys

import numpy as np
import scipy.sparse.linalg as spla
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import nonoverlap
from hpddm_tpu.options import Options
from hpddm_tpu.precond.substructure import (Substructure, feti_solve,
                                            bdd_solve)


def _pack_f(gen, sub):
    S = len(gen.mats)
    f = np.zeros((S, sub.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s], 0] = gen.f[s]
    return jnp.asarray(f)


def _recovered(gen, u):
    N = gen.A_global.shape[0]
    acc = np.zeros(N)
    cnt = np.zeros(N)
    u_np = np.asarray(u)
    for s in range(len(gen.mats)):
        acc[gen.gids[s]] += u_np[s, : gen.n_loc[s], 0]
        cnt[gen.gids[s]] += 1
    return acc / cnt


def _build(gen, mode, **opt_kw):
    opt = Options(substructuring_local=mode, **opt_kw)
    kw = {}
    if mode == "banded":
        kw = dict(kernels=gen.kernels, grid_shapes=gen.grid_shapes,
                  slot_maps=gen.slot_maps)
    return Substructure(gen.mats, gen.neighbors, gen.mappings,
                        options=opt, **kw)


def _run_body(name, extra_env=None, timeout=900):
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        f"from tests.test_substructure_banded import {name}; {name}()")
    env = dict(os.environ, JAX_PLATFORMS="cpu", **(extra_env or {}))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], cwd=root, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])


def test_banded_solver_bodies():
    _run_body("_solver_bodies")


def test_gevp_banded_matches_dense():
    _run_body("_gevp_body")


def test_sharded_banded_matches_batched():
    """banded local mode under shard_map: the (wy, S, ...) factor layout
    needs its own pspecs (subdomain axis = 1); solutions must match the
    batched run."""
    _run_body("_sharded_banded_body",
              {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})


def _solver_bodies():
    """FETI/BDD banded-vs-dense parity + preconditioner variants + mfree
    coarse, batched into one fresh process."""
    # --- FETI banded matches dense, two decompositions ------------------
    for (S, Nx, Ny) in ((16, 32, 32), (4, 20, 24)):
        gen = nonoverlap.generate(S, Nx, Ny)
        x_direct = spla.spsolve(gen.A_global.tocsc(), gen.f_global)
        res = {}
        for mode in ("dense", "banded"):
            sub = _build(gen, mode)
            st = sub.state
            if mode == "banded":
                # kernel bookkeeping must agree with dense eigh detection
                st_d = _build(gen, "dense").state
                np.testing.assert_array_equal(np.asarray(st.r_loc),
                                              np.asarray(st_d.r_loc))
            r = feti_solve(st, _pack_f(gen, sub), tol=1e-9, max_it=200)
            x = _recovered(gen, r.u)
            err = np.linalg.norm(x - x_direct) / np.linalg.norm(x_direct)
            assert err < 1e-6, ("feti", S, mode, err)
            res[mode] = int(r.iterations)
        assert abs(res["banded"] - res["dense"]) <= 1, (S, res)
        print(f"feti {S}x{Nx}x{Ny} ok {res}", flush=True)

    # --- FETI preconditioner variants on banded locals ------------------
    gen = nonoverlap.generate(4, 20, 20)
    sub = _build(gen, "banded")
    x_direct = spla.spsolve(gen.A_global.tocsc(), gen.f_global)
    for precond in ("lumped", "none"):
        r = feti_solve(sub.state, _pack_f(gen, sub), tol=1e-9, max_it=400,
                       precond=precond)
        x = _recovered(gen, r.u)
        assert np.linalg.norm(x - x_direct) / np.linalg.norm(x_direct) \
            < 1e-6, precond
    print("feti preconds ok", flush=True)

    # --- BDD banded matches dense ---------------------------------------
    gen = nonoverlap.generate(9, 24, 24)
    x_direct = spla.spsolve(gen.A_global.tocsc(), gen.f_global)
    res = {}
    for mode in ("dense", "banded"):
        sub = _build(gen, mode)
        r = bdd_solve(sub.state, _pack_f(gen, sub), tol=1e-9, max_it=300)
        x = _recovered(gen, r.u)
        err = np.linalg.norm(x - x_direct) / np.linalg.norm(x_direct)
        assert err < 1e-6, ("bdd", mode, err)
        res[mode] = int(r.iterations)
    # the Chebyshev S^+ changes the preconditioner slightly: allow a
    # small iteration gap but no blow-up
    assert res["banded"] <= res["dense"] + 5, res
    print(f"bdd ok {res}", flush=True)

    # --- banded local + mfree coarse ------------------------------------
    gen = nonoverlap.generate(16, 32, 32)
    x_direct = spla.spsolve(gen.A_global.tocsc(), gen.f_global)
    sub = _build(gen, "banded", substructuring_coarse="mfree")
    r = feti_solve(sub.state, _pack_f(gen, sub), tol=1e-9, max_it=200)
    x = _recovered(gen, r.u)
    assert np.linalg.norm(x - x_direct) / np.linalg.norm(x_direct) < 1e-6
    assert sub.state.G is None          # coarse basis never materialized
    assert sub.state.K_pinv.shape[1] == 1   # dense factors are dummies
    print("mfree ok", flush=True)


def _gevp_body():
    """GenEO enrichment through the matrix-free Lanczos pencil: solutions
    and iteration counts must track the dense-pencil path, and the
    balancing basis must be orthonormal on valid rows with zero padding
    (the Lanczos start vector is purged into the operator range, so no
    pad noise may leak into Sb_kernels)."""
    gen = nonoverlap.generate(16, 32, 32)
    x_direct = spla.spsolve(gen.A_global.tocsc(), gen.f_global)
    res = {}
    for mode in ("dense", "banded"):
        sub = _build(gen, mode)
        st = sub.solve_gevp(nu=2)
        r = bdd_solve(st, _pack_f(gen, sub), tol=1e-9, max_it=300)
        x = _recovered(gen, r.u)
        err = np.linalg.norm(x - x_direct) / np.linalg.norm(x_direct)
        assert err < 1e-6, (mode, err)
        res[mode] = int(r.iterations)
        # balancing basis sanity: zero on padded rows, orthonormal columns
        Sbk = np.asarray(st.Sb_kernels)
        msk = np.asarray(st.b_mask)
        rk = np.asarray(st.sb_r_loc)
        assert np.abs(Sbk[~msk]).max(initial=0.0) < 1e-12, mode
        for s in range(Sbk.shape[0]):
            Q = Sbk[s, :, : rk[s]]
            np.testing.assert_allclose(Q.T @ Q, np.eye(int(rk[s])),
                                       atol=1e-10, err_msg=mode)
    assert res["banded"] <= res["dense"] + 5, res
    print(f"gevp ok {res}", flush=True)


def _sharded_banded_body():
    import jax
    from hpddm_tpu.parallel.mesh import (make_mesh, shard_substructure,
                                         sharded_bdd_solve,
                                         sharded_feti_solve)
    S, n_dev = 8, 4
    gen = nonoverlap.generate(S, 24, 24)
    sub = _build(gen, "banded")
    st = sub.state
    f = _pack_f(gen, sub)
    ref_f = feti_solve(st, f, tol=1e-9, max_it=200)
    ref_b = bdd_solve(st, f, tol=1e-9, max_it=200)

    mesh = make_mesh(n_dev)
    st_sh = shard_substructure(st, mesh)
    # the big banded factors must actually be sharded, not replicated
    shd = st_sh.Kb.Dinv.sharding.spec
    assert shd[1] == "sub", shd
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("sub", None, None)))
    res_f = sharded_feti_solve(st_sh, f_sh, mesh, tol=1e-9, max_it=200)
    assert abs(int(res_f.iterations) - int(ref_f.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res_f.u), np.asarray(ref_f.u),
                               atol=1e-8)
    res_b = sharded_bdd_solve(st_sh, f_sh, mesh, tol=1e-9, max_it=200)
    assert abs(int(res_b.iterations) - int(ref_b.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res_b.u), np.asarray(ref_b.u),
                               atol=1e-8)
