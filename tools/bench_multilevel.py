#!/usr/bin/env python
"""Multilevel crossover at scale (VERDICT r4 missing #4 / weak #6).

At S=1024/2048^2 the coarse space (nc = S * nu ~ 8k) is large enough that
the flat two-level replicated direct coarse stops being free — the regime
the reference's buildThree exists for (HPDDM_inexact_coarse_operator.hpp:
1328).  This tool measures, for one S, the level-2 (direct), level-3
(inexact coarse + direct deflation) and level-4 (chained cg) configs:
setup of the coarse chain, solve wall (fetch-synced), iterations.

Usage: python tools/bench_multilevel.py [S] [N] [nu]   (e.g. 256 2048 8)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("HPDDM_TPU_BANDED_CHAIN", "1")

from hpddm_tpu.timing import fetch, timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from hpddm_tpu.core.scaling import jacobi_scale
    from hpddm_tpu.models import diffusion2d
    from hpddm_tpu.options import Options
    from hpddm_tpu.precond.schwarz import Schwarz
    from hpddm_tpu.solvers.krylov import solve

    argv = [int(a) for a in sys.argv[1:4]]
    S = argv[0] if argv else 256
    N = argv[1] if len(argv) > 1 else 2048
    nu = argv[2] if len(argv) > 2 else 8
    dtype = np.float32

    def kap(xx, yy):
        return (np.where((yy > 3.3) & (yy < 6.6), 1.0e4, 1.0)
                * np.where(xx > 5.0, 10.0, 1.0))

    t0 = time.perf_counter()
    gen = diffusion2d.generate_uniform(S, N, N, overlap=1, kappa=kap,
                                       with_neumann=True, dtype=dtype)
    mats, f_list, neu, _ = jacobi_scale(gen.mats, gen.f, gen.neumann)
    print(f"backend={jax.default_backend()} S={S} N={N} nu={nu} "
          f"gen={time.perf_counter()-t0:.0f}s nc={S*nu}", flush=True)

    base = dict(tol=2e-3, local_solver="banded", coarse_assembly="bsr",
                gmres_restart=40, schwarz_coarse_correction="deflated",
                geneo_nu=nu)
    configs = {
        "L2-direct": {},
        "L3": dict(level_2_krylov_method="cg", level_2_tol=1e-2,
                   level_2_max_it=50),
        "L4": dict(level_2_krylov_method="cg", level_2_tol=1e-2,
                   level_2_max_it=50, level_3_krylov_method="cg",
                   level_3_aggregate_size=4, level_3_geneo_nu=2,
                   level_3_tol=1e-2, level_3_max_it=20,
                   level_4_aggregate_size=4),
    }

    opt0 = Options(**base)
    sch = Schwarz(mats, gen.neighbors, gen.mappings, d=gen.d, options=opt0)
    sch.set_grid_geometry(gen.boxes, N, N)
    t0 = time.perf_counter()
    sch.solve_gevp(neu, method="lanczos")
    print(f"gevp: {time.perf_counter()-t0:.0f}s", flush=True)

    f = np.zeros((S, sch.n_max, 1), dtype=dtype)
    for s in range(S):
        f[s, : gen.n_loc[s]] = f_list[s]
    f = jnp.asarray(f)

    import gc
    for name, extra in configs.items():
        st = sj = res = None
        try:
            opt = Options(**{**base, **extra})
            sch.opt = opt
            t0 = time.perf_counter()
            st = sch.build()
            fetch(st.dec.d)
            t_build = time.perf_counter() - t0
            sj = jax.jit(lambda st_, b: solve(st_, b, opt=opt))
            t_solve, _, res = timed(sj, st, f, reps=2, warmup=1)
            print(f"{name:10s}: build={t_build:6.1f}s "
                  f"solve={t_solve:7.3f}s its={int(res.iterations)}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            # drop the previous config's factors/coarse before the next
            # build — holding two states OOMs the 16 GB HBM at S=256
            st = sj = res = None
            sch._state = None
            gc.collect()


if __name__ == "__main__":
    main()
