"""Pallas DIA SpMV kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz
from hpddm_tpu.ops.spmv import spmm
from hpddm_tpu.ops.pallas_spmv import spmm_dia_pallas


@pytest.mark.parametrize("S,Nx,Ny", [(4, 40, 40), (2, 100, 60)])
@pytest.mark.parametrize("mu", [1, 3, 4])
def test_pallas_dia_matches_reference(S, Nx, Ny, mu):
    gen = diffusion2d.generate(S, Nx, Ny, overlap=1)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=Options())
    state = sch.operator_state()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(S, sch.n_max, mu)))
    y_ref = spmm(state.A, x)
    y_pal = spmm_dia_pallas(state.A, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               atol=1e-11)


def test_merge_scatter_interpret():
    from hpddm_tpu.ops.pallas_exchange import ScatterPlan, merge_scatter
    rng = np.random.default_rng(1)
    N, K = 4000, 250
    x = rng.normal(size=N)
    pos = rng.choice(N, size=K, replace=False).astype(np.int64)
    pos_all = np.concatenate([pos, np.full(10, N + 3, np.int64)])
    vals = rng.normal(size=K + 10)
    plan = ScatterPlan.build(pos_all, N, block_rows=8)
    out = np.asarray(merge_scatter(plan, jnp.asarray(x), jnp.asarray(vals),
                                   interpret=True))
    ref = x.copy()
    ref[pos] = vals[:K]
    np.testing.assert_allclose(out, ref, atol=0)
