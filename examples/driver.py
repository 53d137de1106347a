#!/usr/bin/env python
"""GCRO-DR recycling driver — the analogue of examples/driver.cpp: solve a
sequence of related linear systems, recycling the deflation subspace
between solves, and regression-check *total* iteration windows.

Reference scale: restart 40, recycle 20, tol 1e-10 (driver.cpp:69-72) on a
10-system n=2025 drifting-coefficient diffusion sequence
(hpddm_tpu.models.sequences.drifting_diffusion — the reference's shipped
~400-system fracture sequence is not redistributable, so an analogous
family is synthesized).

The windows below are **reference-derived**: recorded from the actual
HPDDM binary (built sequentially per tools/refparity.py) run on this exact
sequence — GMRES(40) = 1871, GCRODR(40,20) strategy A = 1561, strategy
B = 1713 total iterations (f64). The GMRES window is ±10 per
driver.cpp:151-156's methodology (measured delta: exactly 0); GCRODR gets
±25 — across *implementations* the recycle-space eigensolves differ in
the last digits, drifting a few iterations per restart cycle (measured
delta: +13 of 1561). tests/test_reference_parity.py re-derives windows
live against the binary. Ours runs strategy B faster than
the reference (exact pencil rows, see solvers/gcrodr.py), so its gate is
one-sided.

    python examples/driver.py [-hpddm_recycle 20] [-hpddm_variant right]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# reference-binary totals on this sequence (see module docstring)
REF_GMRES = 1871
REF_GCRODR_A = 1561
REF_GCRODR_B = 1713


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from hpddm_tpu.models.sequences import drifting_diffusion
    from hpddm_tpu.options import Options
    from hpddm_tpu.solvers.base import LinearOperator
    from hpddm_tpu.solvers.krylov import solve

    argv = list(sys.argv[1:] if argv is None else argv)
    opt = Options.parse(argv, display=True)
    restart = int(opt.val("gmres_restart", 40))
    recycle = int(opt.val("recycle", 20))
    tol = float(opt.val("tol", 1e-10))
    systems = drifting_diffusion(n_sys=10, nx=45, ny=45)

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
    for A, rhs in systems:
        Ad = jnp.asarray(A.todense())
        op = LinearOperator(
            gmv=lambda x, Ad=Ad: jnp.einsum("nk,skm->snm", Ad, x))
        b = jnp.asarray(np.asarray(rhs)[None, :, None])
        rg = solve(op, b, opt=opt_g)
        rr = solve(op, b, opt=opt_r)
        total_g += int(rg.iterations)
        total_r += int(rr.iterations)
    print(f"total iterations: GMRES({restart}) = {total_g}, "
          f"GCRODR({restart},{recycle}) = {total_r}")
    if not (total_r < total_g):
        return 1
    # reference-derived windows hold only at the recorded configuration
    # in f64 (CPU); other configs still enforce recycling-beats-GMRES
    default_cfg = (restart == 40 and recycle == 20 and tol == 1e-10
                   and jax.config.jax_enable_x64
                   and opt.val("variant") in (None, "right"))
    if not default_cfg:
        return 0
    if abs(total_g - REF_GMRES) > 10:
        return 1
    strategy = opt.val("recycle_strategy") or "A"
    if strategy == "A":
        if abs(total_r - REF_GCRODR_A) > 25:
            return 1
    else:  # B: ours converges faster; one-sided window
        if not (0.7 * REF_GCRODR_B <= total_r <= REF_GCRODR_B + 10):
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
