"""Saddle-point Schur-complement solves (precond/saddle.py): lid-driven
MAC Stokes with DD inner solves must match the direct KKT solution and
satisfy both residual blocks."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from hpddm_tpu.models import stokes2d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.saddle import SaddleSolver


def _direct(A, B, f, g):
    """Bordered KKT solve with the zero-mean pressure constraint."""
    n_vel, n_p = A.shape[0], B.shape[0]
    e = np.ones((n_p, 1))
    K = sp.bmat([[A, B.T, None],
                 [B, None, e],
                 [None, e.T, None]], format="csc")
    rhs = np.concatenate([f, g, [0.0]])
    sol = spla.spsolve(K, rhs)
    return sol[:n_vel], sol[n_vel: n_vel + n_p]


def test_stokes_schur_matches_direct():
    N, S = 24, 4
    gen, B, f, g, h = stokes2d.generate(S, N=N, overlap=2)
    u_d, p_d = _direct(gen.A_global, B, f, g)

    opt = Options(tol=1e-10, max_it=400)
    sv = SaddleSolver(gen, B, options=opt)
    res = sv.solve(f, g, tol=1e-8)
    assert res.rel_res <= 1e-8
    # block residuals of the full saddle system
    r1 = gen.A_global @ res.u + B.T @ res.p - f
    r2 = B @ res.u - g
    assert np.linalg.norm(r1) / np.linalg.norm(f) < 1e-6
    assert np.linalg.norm(r2) < 1e-6 * np.linalg.norm(res.u) / h
    # solution match (pressure compared zero-mean)
    assert np.linalg.norm(res.u - u_d) / np.linalg.norm(u_d) < 1e-6
    pd0 = p_d - p_d.mean()
    assert np.linalg.norm(res.p - pd0) / max(np.linalg.norm(pd0), 1) < 1e-5
    # the Schur CG must converge fast (S is spectrally equivalent to the
    # pressure mass matrix for Stokes)
    assert res.outer_iterations < 80


def test_stokes_schur_with_geneo_inner():
    """Two-level inner solves (GenEO on the velocity block, genuine
    edge-Laplacian Neumann matrices) cut the accumulated inner
    iteration count."""
    N, S = 24, 4
    gen, B, f, g, h, neumann = stokes2d.generate(S, N=N, overlap=2,
                                                 with_neumann=True)
    inner = {}
    for nu in (0, 8):
        kwargs = dict(tol=1e-10, max_it=400)
        if nu:
            kwargs.update(schwarz_coarse_correction="deflated", geneo_nu=nu)
        opt = Options(**kwargs)
        sv = SaddleSolver(gen, B, options=opt,
                          neumann=neumann if nu else None)
        res = sv.solve(f, g, tol=1e-8)
        assert res.rel_res <= 1e-8
        inner[nu] = res.inner_iterations
    assert inner[8] < inner[0], inner
