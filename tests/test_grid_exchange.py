"""Structured-grid halo exchange (parallel/grid.py): must reproduce the
general exchange exactly, batched and sharded, and the uniform-box
decomposition's GMV must match the global 5-point operator."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp
from jax.sharding import PartitionSpec as P

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.parallel import ops as pops
from hpddm_tpu.parallel.grid import build_grid_plan
from hpddm_tpu.parallel.mesh import make_mesh
from hpddm_tpu.precond.schwarz import Schwarz, gmv


def _dec_with_plan(gen):
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=Options())
    plan = build_grid_plan(gen.boxes)
    assert plan is not None
    assert plan.H * plan.W == sch.dec.n_max
    return sch, dataclasses.replace(sch.dec, grid=plan)


@pytest.mark.parametrize("gen_fn", [
    lambda: diffusion2d.generate_uniform(9, 24, 24, overlap=2),
    lambda: diffusion2d.generate_uniform(16, 64, 64, overlap=1),
    lambda: diffusion2d.generate(4, 100, 100, overlap=1),   # 2x2 is uniform
    lambda: diffusion2d.generate(4, 100, 100, overlap=3),
])
def test_grid_exchange_matches_general(gen_fn):
    gen = gen_fn()
    sch, dec_g = _dec_with_plan(gen)
    S = dec_g.S
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(S, dec_g.n_max, 2)))
    a = np.asarray(pops.exchange(dataclasses.replace(dec_g, grid=None), x))
    b = np.asarray(pops.exchange(dec_g, x))
    np.testing.assert_allclose(b, a, rtol=0.0, atol=1e-13)


def test_grid_exchange_sharded():
    S = 8
    gen = diffusion2d.generate_uniform(S, 64, 64, overlap=1)
    sch, dec_g = _dec_with_plan(gen)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(S, dec_g.n_max, 2)))
    ref = np.asarray(pops.exchange(dec_g, x))
    mesh = make_mesh(4)
    x_sh = jax.device_put(x, jax.sharding.NamedSharding(
        mesh, P("sub", None, None)))
    specs = jax.tree_util.tree_map(
        lambda l: P("sub") if (hasattr(l, "ndim") and l.ndim > 0
                               and l.shape[0] == S) else P(), dec_g)
    out = jax.shard_map(lambda d_, v: pops.exchange(d_, v, axis_name="sub"),
                        mesh=mesh, in_specs=(specs, P("sub", None, None)),
                        out_specs=P("sub", None, None),
                        check_vma=False)(dec_g, x_sh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0.0, atol=0.0)


def test_uniform_decomposition_gmv_exact():
    """generate_uniform + grid plan: GMV == global operator application."""
    S, Nx = 8, 64
    gen = diffusion2d.generate_uniform(S, Nx, Nx, overlap=1)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=Options())
    sch.set_grid_geometry(gen.boxes, Nx, Nx)
    assert sch.dec.grid is not None      # auto-attached
    state = sch.operator_state()
    gids = []
    for (i0, i1, j0, j1) in gen.boxes:
        jj, ii = np.meshgrid(np.arange(j0, j1), np.arange(i0, i1),
                             indexing="ij")
        gids.append((jj * Nx + ii).ravel())
    rng = np.random.default_rng(2)
    xg = rng.normal(size=(Nx * Nx,))
    xloc = np.zeros((S, sch.dec.n_max, 1))
    for s in range(S):
        xloc[s, :, 0] = xg[gids[s]]
    y = np.asarray(gmv(state, jnp.asarray(xloc)))
    dxx = (Nx / 10.0) ** 2
    n = Nx * Nx
    A = sp.diags([4 * dxx * np.ones(n), -dxx * np.ones(n - 1),
                  -dxx * np.ones(n - 1), -dxx * np.ones(n - Nx),
                  -dxx * np.ones(n - Nx)], [0, 1, -1, Nx, -Nx],
                 format="lil")
    for r in range(1, Nx):
        A[r * Nx, r * Nx - 1] = 0
        A[r * Nx - 1, r * Nx] = 0
    yg = A.tocsr() @ xg
    for s in range(S):
        np.testing.assert_allclose(y[s, :, 0], yg[gids[s]], atol=1e-10)


def test_uniform_solve_converges():
    """End-to-end RAS solve on the uniform decomposition."""
    from hpddm_tpu.precond.schwarz import compute_residual
    from hpddm_tpu.solvers.krylov import solve
    S, Nx = 4, 64
    gen = diffusion2d.generate_uniform(S, Nx, Nx, overlap=2)
    opt = Options(tol=1e-8)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    sch.set_grid_geometry(gen.boxes, Nx, Nx)
    state = sch.build()
    f = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = jnp.asarray(f)
    res = solve(state, f, opt=opt)
    nb, nr = compute_residual(state, res.x, f)
    assert float(nr[0] / nb[0]) <= 1e-6
    assert int(res.iterations) < 60


def _exchange_hlo(dec, S, n_dev):
    mesh = make_mesh(n_dev)
    specs = jax.tree_util.tree_map(
        lambda l: P("sub") if (hasattr(l, "ndim") and l.ndim > 0
                               and l.shape[0] == S) else P(), dec)
    fn = jax.shard_map(lambda d_, v: pops.exchange(d_, v, axis_name="sub"),
                       mesh=mesh, in_specs=(specs, P("sub", None, None)),
                       out_specs=P("sub", None, None), check_vma=False)
    x = jax.ShapeDtypeStruct((S, dec.n_max, 1), jnp.float64)
    return jax.jit(fn).lower(dec, x).compile().as_text()


@pytest.mark.parametrize("path", ["grid", "general"])
def test_exchange_neighbor_only_comm(path):
    """The sharded halo must be point-to-point with neighbors only
    (HPDDM_subdomain.hpp:115-130): no all-gather in the compiled exchange,
    and on 1-D strip decompositions with a fixed subdomain size the
    per-device collective-permute shapes must be *identical* between
    S=P=5 and S=P=7 — per-device comm volume independent of the total
    subdomain count (the weak-scaling requirement)."""
    import re

    def build(S, uniform):
        # prime S -> 1 x S strip grid; fixed 16x16 boxes
        if uniform:
            gen = diffusion2d.generate_uniform(S, 16, 16 * S, overlap=1)
            _, dec = _dec_with_plan(gen)
        else:
            gen = diffusion2d.generate(S, 16, 16 * S, overlap=1)
            sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                          options=Options())
            dec = sch.dec
        return dec

    def cp_shapes(txt):
        cp = [c for c in re.findall(r"(\S+)\s+collective-permute", txt)
              if "[" in c]
        return sorted(cp)

    shapes = {}
    for S in (5, 7):
        txt = _exchange_hlo(build(S, path == "grid"), S, S)
        assert "all-gather" not in txt, (path, S)
        assert cp_shapes(txt), (path, S, "no collective-permute found")
        shapes[S] = cp_shapes(txt)
    assert shapes[5] == shapes[7], shapes

    # 2D process grid (2x4): still strictly neighbor-to-neighbor
    txt = _exchange_hlo(build(8, path == "grid"), 8, 8)
    assert "all-gather" not in txt, path
    assert cp_shapes(txt), path


def test_mu_leading_gmv_matches_trailing():
    """Round 4: the multi-RHS canvas fast path (RHS axis leading through
    spmm_dia_canvas_muT + grid_exchange_muT) must match the generic
    spmm + scaled_exchange composition exactly."""
    import numpy as np
    import jax.numpy as jnp
    from hpddm_tpu.models import diffusion2d
    from hpddm_tpu.options import Options
    from hpddm_tpu.ops.spmv import spmm
    from hpddm_tpu.parallel.ops import scaled_exchange
    from hpddm_tpu.precond.schwarz import Schwarz, gmv

    S, N = 4, 64
    gen = diffusion2d.generate_uniform(S, N, N, overlap=1)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=Options())
    sch.set_grid_geometry(gen.boxes, N, N)
    state = sch.operator_state()
    assert state.A.canvas_hw is not None
    rng = np.random.default_rng(0)
    for mu in (2, 4):
        x = jnp.asarray(rng.normal(size=(S, sch.n_max, mu)))
        y_fast = gmv(state, x)
        y_ref = scaled_exchange(state.dec, spmm(state.A, x), None)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   rtol=1e-12, atol=1e-12)
