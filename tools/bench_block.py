#!/usr/bin/env python
"""Block-method wall-clock A/B: fused muT GMV vs the round-5 scan GMV.

VERDICT r4 #5 asks for the BGMRES/BGCRODR mu=4 end-to-end improvement,
not just the GMV microbenchmark.  Runs the same two-level BGMRES (and
BGCRODR) solve twice in one process — HPDDM_TPU_MUT_SCAN=0 vs 1 — on a
512^2/16 grid with mu random RHS, fetch-synced.

Usage: python tools/bench_block.py [N S mu]   (default 512 16 4)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpddm_tpu.timing import fetch, timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from hpddm_tpu.models import diffusion2d
    from hpddm_tpu.options import Options
    from hpddm_tpu.precond.schwarz import Schwarz
    from hpddm_tpu.solvers.krylov import solve

    argv = [int(a) for a in sys.argv[1:4]]
    N = argv[0] if argv else 512
    S = argv[1] if len(argv) > 1 else 16
    mu = argv[2] if len(argv) > 2 else 4
    dtype = np.float32
    gen = diffusion2d.generate_uniform(S, N, N, overlap=1,
                                       with_neumann=True, dtype=dtype)
    print(f"backend={jax.default_backend()} N={N} S={S} mu={mu}",
          flush=True)
    rng = np.random.default_rng(0)
    for method in ("bgmres", "bgcrodr"):
        opt = Options(tol=1e-6, max_it=200, krylov_method=method,
                      local_solver="banded",
                      schwarz_coarse_correction="deflated", geneo_nu=8,
                      **({"recycle": 10} if method == "bgcrodr" else {}))
        sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        sch.set_grid_geometry(gen.boxes, N, N)
        sch.solve_gevp(gen.neumann, method="lanczos")
        st = sch.build()
        f = np.zeros((S, sch.n_max, mu), dtype=dtype)
        for s in range(S):
            f[s, : gen.n_loc[s]] = rng.normal(
                size=(gen.n_loc[s], mu)).astype(dtype)
        f = sch.exchange_rhs(jnp.asarray(f))
        for scan in ("0", "1"):
            os.environ["HPDDM_TPU_MUT_SCAN"] = scan
            if method == "bgmres":
                sj = jax.jit(lambda st_, b: solve(st_, b, opt=opt))
            else:
                # gcrodr orchestrates recycling on host — not one jit
                def sj(st_, b):
                    return solve(st_, b, opt=opt)
            t, _, res = timed(sj, st, f, reps=3, warmup=1)
            print(f"{method} mu={mu} scan={scan}: {t:8.3f}s "
                  f"{int(res.iterations)} its", flush=True)
    os.environ.pop("HPDDM_TPU_MUT_SCAN", None)


if __name__ == "__main__":
    main()
