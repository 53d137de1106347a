#!/usr/bin/env python
"""GCRO-DR recycling driver — the analogue of examples/driver.cpp: solve a
sequence of related linear systems, recycling the deflation subspace
between solves, and regression-check the *total* iteration count windows
(driver.cpp:151-156 checks 2346 < it < 2366 etc. on its shipped data; the
reference data tarball is not in the tree, so the sequence here is
synthesized — a diffusion operator with a slowly-drifting diagonal — and
the windows were recorded from this implementation as the regression
baseline).

    python examples/driver.py [-hpddm_recycle 20] [-hpddm_variant right]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from hpddm_tpu.options import Options
    from hpddm_tpu.solvers.base import LinearOperator
    from hpddm_tpu.solvers.krylov import solve

    argv = list(sys.argv[1:] if argv is None else argv)
    opt = Options.parse(argv, display=True)
    n = 120
    n_sys = 8
    restart = int(opt.val("gmres_restart", 15))
    recycle = int(opt.val("recycle", 8))
    tol = float(opt.val("tol", 1e-8))
    rng = np.random.default_rng(42)
    b = jnp.asarray(rng.normal(size=(1, n, 1)))

    def system(i):
        diag = 2.0 + 0.02 * i + 0.05 * np.sin(np.arange(n) * 0.1 + i)
        A = sp.diags([-np.ones(n - 1), diag, -np.ones(n - 1)],
                     [-1, 0, 1]).tocsr()
        Ad = jnp.asarray(A.todense())
        return LinearOperator(gmv=lambda x: jnp.einsum("nk,skm->snm", Ad, x))

    # everything goes through solve(); the recycled (U, C) pair persists
    # between calls in the Options' per-prefix storage
    # (OptionsPrefix::storage_, HPDDM_option.hpp:444-461)
    opt_r = opt.copy()
    opt_r["krylov_method"] = "gcrodr"
    opt_r["recycle"] = recycle
    opt_r["tol"], opt_r["max_it"] = tol, 1000
    opt_r["gmres_restart"] = restart
    opt_g = opt_r.copy()
    opt_g["krylov_method"] = "gmres"

    total_g = total_r = 0
    for i in range(n_sys):
        op = system(i)
        rg = solve(op, b, opt=opt_g)
        rr = solve(op, b, opt=opt_r)
        total_g += int(rg.iterations)
        total_r += int(rr.iterations)
    print(f"total iterations: GMRES({restart}) = {total_g}, "
          f"GCRODR({restart},{recycle}) = {total_r}")
    # regression windows (recorded baseline, analogous to driver.cpp:151-156)
    if not (total_r < total_g):
        return 1
    # recorded baselines (CPU f64; GMRES alone: 2760): strategy A = 659,
    # strategy B (the reduction-free pencil, deliberately cheaper and less
    # accurate) = 1100
    cap = 900 if opt.val("recycle_strategy") == "A" else 1400
    if not (total_r < cap):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
