#!/usr/bin/env python
"""Single-domain direct re-solve of a dumped matrix — the analogue of
examples/solver.py: load, factorize with the batched local solver, check
the residual (the sizeWorld == 1 branch of schwarz.cpp:149-185).

    python examples/solver.py -matrix_filename dump.txt
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from hpddm_tpu.core.csr import MatrixCSR
    from hpddm_tpu.core.formats import pack_local_matrices, batched_dense_from
    from hpddm_tpu.ops.local_solve import factorize
    from hpddm_tpu.options import Options

    argv = list(sys.argv[1:] if argv is None else argv)
    opt = Options.parse(argv, display=True,
                        app_options=[("matrix_filename=<input_file>",
                                      "Matrix file.")])
    path = opt.app().get("matrix_filename")
    if not isinstance(path, str) or not path:
        from hpddm_tpu.models import diffusion2d
        gen = diffusion2d.generate(1, 40, 40)
        path = os.path.join(tempfile.gettempdir(), "hpddm_tpu_dump.txt")
        gen.mats[0].dump(path)
    A = MatrixCSR.from_file(path)
    Ad = batched_dense_from(pack_local_matrices([A], fmt="dense"))
    solver = factorize(Ad, kind=opt.val("local_solver"))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(1, A.n, 1)))
    x = solver.solve(b)
    r = np.asarray(b)[0, :, 0] - A.scipy() @ np.asarray(x)[0, :, 0]
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
    print(f"residual: {rel:.3e}")
    tol = 1e-6 if np.asarray(x).dtype == np.float64 else 1e-2
    return 0 if rel <= tol else 1


if __name__ == "__main__":
    sys.exit(main())
