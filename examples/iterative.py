#!/usr/bin/env python
"""Matrix-free Krylov with a user (host) preconditioner — the analogue of
examples/iterative.py in the reference: load a dumped matrix, precondition
GMRES with scipy's spilu through a host callback (the Python-callback
preconditioner path, hpddm.py:118-231), oracle its <= 50 and residual
<= 1e-4 (iterative.py:100-119).

    python examples/iterative.py -matrix_filename dump.txt
(with no argument, generates the 2D diffusion matrix and dumps it first —
the schwarz.cpp -hpddm_dump_matrices workflow)."""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from hpddm_tpu.core.csr import MatrixCSR
    from hpddm_tpu.options import Options
    from hpddm_tpu.solvers.base import LinearOperator
    from hpddm_tpu.solvers.gmres import gmres

    argv = list(sys.argv[1:] if argv is None else argv)
    opt = Options.parse(argv, display=True,
                        app_options=[("matrix_filename=<input_file>",
                                      "Matrix file.")])
    path = opt.app().get("matrix_filename")
    if not isinstance(path, str) or not path:
        # dump-then-reload round trip (the -hpddm_dump_matrices workflow)
        from hpddm_tpu.models import diffusion2d
        gen = diffusion2d.generate(1, 50, 50)
        path = os.path.join(tempfile.gettempdir(), "hpddm_tpu_dump.txt")
        gen.mats[0].dump(path)
        print(f"dumped generated matrix to {path}")
    A = MatrixCSR.from_file(path)
    csr = A.scipy()
    n = A.n

    ilu = spla.spilu(csr.tocsc(), drop_tol=1e-4, fill_factor=10)

    def ilu_apply(x):
        # host-callback preconditioner: the analogue of the reference's
        # Python callback into HPDDM's Krylov loop
        def cb(v):
            out = np.empty_like(v)
            for j in range(v.shape[-1]):
                out[0, :, j] = ilu.solve(np.asarray(v[0, :, j]))
            return out
        return jax.pure_callback(cb, jax.ShapeDtypeStruct(x.shape, x.dtype),
                                 x, vmap_method="sequential")

    Ad = jnp.asarray(A.dense())
    op = LinearOperator(gmv=lambda x: jnp.einsum("nk,skm->snm", Ad, x),
                        apply=ilu_apply)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(1, n, 1)))
    res = gmres(op, b, tol=1e-6, restart=40,
                max_it=int(opt.val("max_it", 100)))
    x = np.asarray(res.x)[0, :, 0]
    r = np.asarray(b)[0, :, 0] - csr @ x
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
    print(f"iterations: {int(res.iterations)}, residual: {rel:.3e}")
    return 0 if (int(res.iterations) <= 50 and rel <= 1e-4) else 1


if __name__ == "__main__":
    sys.exit(main())
