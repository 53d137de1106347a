"""3D heterogeneous elasticity (H8): rigid-body nullspace, GMV exactness
on the algebraic decomposition, and the GenEO two-level contract
(the reference's SC13 headline workload class, README.md:42-45)."""

import numpy as np
import jax.numpy as jnp

from hpddm_tpu.models import elasticity3d
from hpddm_tpu.options import Options
from hpddm_tpu.precond.schwarz import Schwarz, compute_residual, gmv
from hpddm_tpu.solvers.krylov import solve


def test_h8_rigid_body_nullspace():
    """The element stiffness must annihilate all 6 rigid-body modes."""
    h = 0.25
    Ke = elasticity3d.h8_stiffness(3.7, 0.3, h)
    # corner coordinates in the element's own frame, binary (x,y,z) order
    corners = np.array([[i, j, k] for k in (0, 1) for j in (0, 1)
                        for i in (0, 1)], dtype=np.float64) * h
    R = np.zeros((24, 6))
    for a, (x, y, z) in enumerate(corners):
        R[3 * a + 0, 0] = R[3 * a + 1, 1] = R[3 * a + 2, 2] = 1.0
        R[3 * a + 0, 3], R[3 * a + 1, 3] = -y, x      # rot z
        R[3 * a + 1, 4], R[3 * a + 2, 4] = -z, y      # rot x
        R[3 * a + 0, 5], R[3 * a + 2, 5] = z, -x      # rot y
    assert np.abs(Ke @ R).max() < 1e-10 * np.abs(Ke).max()
    # symmetry + positive semidefiniteness with exactly 6 zero modes
    np.testing.assert_allclose(Ke, Ke.T, atol=1e-12)
    w = np.linalg.eigvalsh(Ke)
    assert np.all(w > -1e-10) and (np.abs(w) < 1e-8).sum() == 6


def test_gmv_exactness_3d():
    S = 4
    gen, _, _ = elasticity3d.generate(S, Nx=7, Ny=7, Nz=7, overlap=2)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d)
    state = sch.build()
    N = gen.A_global.shape[0]
    rng = np.random.default_rng(0)
    g = rng.normal(size=N)
    x = np.zeros((S, sch.n_max, 1))
    for s in range(S):
        x[s, : gen.n_loc[s], 0] = g[gen.gids[s]]
    y = np.asarray(state.dec.unpermute(
        gmv(state, state.dec.permute(jnp.asarray(x)))))
    ref = gen.A_global @ g
    for s in range(S):
        np.testing.assert_allclose(
            y[s, : gen.n_loc[s], 0], ref[gen.gids[s]],
            atol=1e-8 * np.abs(ref).max())


def test_subdomain_rbm_nullspace():
    """Unclamped subdomains' Neumann matrices annihilate the 6 RBMs.

    Uses an explicit x-slab partition so subdomains away from the clamped
    x = 0 face exist (fromfile.decompose accepts a user ``owner``)."""
    S, Nx = 4, 7
    from hpddm_tpu.models.fromfile import decompose
    from hpddm_tpu.core.csr import MatrixCSR  # noqa: F401  (doc pointer)
    import hpddm_tpu.models.elasticity3d as e3

    # monkey-patched pipeline: run generate's assembly, then re-decompose
    # with slab ownership by intercepting decompose via the owner argument
    gen, neumann, rbm = e3.generate(S, Nx=Nx, Ny=Nx, Nz=Nx, overlap=1,
                                    owner_fn=lambda node_x: node_x * S // Nx)
    checked = 0
    for s in range(S):
        Ns = neumann[s].scipy(expand=True)
        scale = np.abs(Ns).max()
        if scale > 1e7:        # subdomain touches the clamped face
            continue
        assert np.abs(Ns @ rbm[s]).max() < 1e-8 * scale
        checked += 1
    assert checked >= 2        # slabs away from x=0 are unclamped


def test_elasticity3d_two_level_geneo():
    S = 4
    gen, neumann, _ = elasticity3d.generate(S, Nx=8, Ny=8, Nz=8,
                                            contrast=1e3, overlap=2)
    f = None
    its = {}
    for nu in (0, 10):
        kwargs = dict(tol=1e-6, max_it=300, gmres_restart=150)
        if nu:
            kwargs.update(schwarz_coarse_correction="deflated", geneo_nu=nu)
        opt = Options(**kwargs)
        sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                      options=opt)
        if f is None:
            fg = np.zeros((S, sch.n_max, 1))
            for s in range(S):
                fg[s, : gen.n_loc[s], 0] = gen.f[s][:, 0]
            f = sch.exchange_rhs(jnp.asarray(fg))
        if nu:
            sch.solve_gevp(neumann)
        state = sch.build()
        res = solve(state, f, opt=opt)
        nb, nr = compute_residual(state, res.x, f)
        rel = np.asarray(nr) / np.asarray(nb)
        assert np.all(rel < 1e-2), (nu, rel)
        its[nu] = int(res.iterations)
    assert its[10] < its[0], its
