#!/usr/bin/env python
"""3D diffusion driver: two-level GenEO-RAS on the 7-point stencil.

Beyond the reference's 2D example surface — production DD workloads are
3D. Exits nonzero if the solve misses the oracle (residual <= 1e-2 and
iterations <= the cap, matching the 2D driver's gates).

    python examples/diffusion3d.py -N 8 -Nx 16 -contrast 1e3 \
        [-hpddm_schwarz_coarse_correction deflated -hpddm_geneo_nu 6] \
        [-hpddm_coarse_assembly bsr]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    import jax.numpy as jnp
    from hpddm_tpu.models import diffusion3d
    from hpddm_tpu.options import Options
    from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
    from hpddm_tpu.solvers.krylov import solve

    argv = list(sys.argv[1:] if argv is None else argv)
    app = [("N=<8>", "Number of subdomains."),
           ("Nx=<16>", "Grid points per direction."),
           ("overlap=<1>", "Overlap width."),
           ("contrast=<1.0>", "Checkerboard coefficient contrast."),
           ("generate_random_rhs=<0>", "Number of random RHS.")]
    opt = Options.parse(argv, display=True, app_options=app)
    S = int(opt.app()["N"])
    N = int(opt.app()["Nx"])
    overlap = int(opt.app()["overlap"])
    contrast = float(opt.app()["contrast"])
    mu = int(opt.app()["generate_random_rhs"])

    kappa = None
    if contrast > 1.0:
        def kappa(x, y, z):
            return np.where((np.floor(x / 2.5) + np.floor(y / 2.5)
                             + np.floor(z / 2.5)) % 2 == 0, 1.0, contrast)

    two_level = opt.val("schwarz_coarse_correction") is not None
    gen = diffusion3d.generate_uniform(S, N, N, N, overlap=overlap,
                                       mu=mu, kappa=kappa,
                                       with_neumann=two_level)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=opt)
    nrhs = max(mu, 1)
    f = np.zeros((S, sch.n_max, nrhs))
    for s in range(S):
        f[s, : gen.n_loc[s]] = gen.f[s]
    f = jnp.asarray(f)
    if two_level:
        sch.solve_gevp(gen.neumann)
    if int(opt.val("verbosity", 0)) > 0:
        print(sch.statistics())
    state = sch.build()
    res = solve(state, f, opt=opt)
    nb, nr = compute_residual(state, res.x, f)
    it = int(res.iterations)
    for i in range(nrhs):
        print(f" --- residual = {float(np.abs(np.asarray(nr)[i])):e} / "
              f"{float(np.abs(np.asarray(nb)[i])):e}")
    method = (opt.val("krylov_method") or "gmres").upper()
    print(f"{method} converges after {it} iterations")
    rel = np.abs(np.asarray(nr) / np.asarray(nb))
    cap = 45 if S > 1 else 75
    if it > cap or np.any(rel > 1e-2):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
