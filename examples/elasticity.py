#!/usr/bin/env python
"""Heterogeneous linear-elasticity driver: two-level GenEO-RAS + (block)
GMRES (BASELINE.md config 4).

    python examples/elasticity.py -N 4 -Nx 24 -contrast 1e3 \
        [-hpddm_geneo_nu 10] [-hpddm_krylov_method bgmres -mu 2]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from hpddm_tpu.models import elasticity2d
    from hpddm_tpu.options import Options
    from hpddm_tpu.precond.schwarz import Schwarz, compute_residual
    from hpddm_tpu.solvers.krylov import solve

    argv = list(sys.argv[1:] if argv is None else argv)
    app = [("N=<4>", "Number of subdomains."),
           ("Nx=<24>", "Nodes per direction."),
           ("contrast=<1e3>", "Young's modulus contrast."),
           ("mu=<1>", "Number of right-hand sides."),
           ("dim=<2>", "Spatial dimension (2 = plane stress Q1, 3 = H8).")]
    opt = Options.parse(argv, display=True, app_options=app)
    S = int(opt.app()["N"])
    Nx = int(opt.app()["Nx"])
    contrast = float(opt.app()["contrast"])
    mu = int(opt.app()["mu"])
    dim = int(opt.app()["dim"])
    if not opt.set("max_it"):
        opt["max_it"] = 400
    if not opt.set("gmres_restart"):
        opt["gmres_restart"] = 200

    if dim == 3:
        from hpddm_tpu.models import elasticity3d
        gen, neumann, rbm = elasticity3d.generate(
            S, Nx=Nx, Ny=Nx, Nz=Nx, contrast=contrast, overlap=2)
    else:
        gen, neumann, rbm = elasticity2d.generate(
            S, Nx=Nx, Ny=Nx, contrast=contrast, overlap=2)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d, options=opt)
    rng = np.random.default_rng(0)
    f = np.zeros((S, sch.n_max, mu))
    for s in range(S):
        f[s, : gen.n_loc[s], 0] = gen.f[s][:, 0]
        for j in range(1, mu):
            f[s, : gen.n_loc[s], j] = rng.normal(size=gen.n_loc[s])
    f = sch.exchange_rhs(jnp.asarray(f))

    if opt.set("schwarz_coarse_correction") and int(opt.val("geneo_nu")) > 0:
        nu_loc = sch.solve_gevp(neumann)
        print(f"GenEO: nu per subdomain = {nu_loc.tolist()}")
    state = sch.build()
    res = solve(state, f, opt=opt)
    nb, nr = compute_residual(state, res.x, f)
    it = int(res.iterations)
    rel = np.asarray(nr) / np.asarray(nb)
    print(f"iterations: {it}")
    for j, r in enumerate(rel):
        print(f" --- residual = {float(np.asarray(nr)[j]):.6e} / "
              f"{float(np.asarray(nb)[j]):.6e}"
              + (f" (rhs #{j + 1})" if mu > 1 else ""))
    return 0 if np.all(rel <= 1e-2) else 1


if __name__ == "__main__":
    sys.exit(main())
