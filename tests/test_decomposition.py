"""Decomposition + exchange semantics tests.

Key invariants from the reference (SURVEY.md §5):
* exchange is an additive reduction over duplicated unknowns,
* scaled exchange (POU then sum) is the identity on consistent vectors,
* POU-weighted dots count every global dof exactly once.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hpddm_tpu.models import diffusion2d
from hpddm_tpu.parallel.decomposition import Decomposition
from hpddm_tpu.parallel.ops import exchange, scaled_exchange, weighted_dot, \
    weighted_norm_sq


def _global_index_map(gen):
    """Map each (s, local dof) to its global grid id for validation."""
    _, _, Nx, Ny, _ = gen.grid
    gids = []
    for s, (i0, i1, j0, j1) in enumerate(gen.boxes):
        jj, ii = np.meshgrid(np.arange(j0, j1), np.arange(i0, i1),
                             indexing="ij")
        gids.append((jj * Nx + ii).ravel())
    return gids


@pytest.mark.parametrize("S,Nx,Ny,overlap", [(2, 20, 20, 1), (4, 20, 20, 1),
                                             (4, 21, 19, 2), (8, 24, 24, 3)])
def test_exchange_matches_global_sum(S, Nx, Ny, overlap):
    gen = diffusion2d.generate(S, Nx, Ny, overlap=overlap)
    dec = Decomposition.from_subdomains(gen.neighbors, gen.mappings,
                                        gen.n_loc, d=gen.d,
                                        renumber=False)
    gids = _global_index_map(gen)

    rng = np.random.default_rng(3)
    x = np.zeros((dec.S, dec.n_max, 1))
    for s in range(S):
        x[s, : gen.n_loc[s], 0] = rng.normal(size=gen.n_loc[s])

    out = np.asarray(exchange(dec, jnp.asarray(x)))

    # ground truth: sum over all subdomains sharing the same global dof
    acc = np.zeros(Nx * Ny)
    count = np.zeros(Nx * Ny)
    for s in range(S):
        np.add.at(acc, gids[s], x[s, : gen.n_loc[s], 0])
        np.add.at(count, gids[s], 1)
    for s in range(S):
        expected = np.where(count[gids[s]] > 1, acc[gids[s]],
                            x[s, : gen.n_loc[s], 0])
        np.testing.assert_allclose(out[s, : gen.n_loc[s], 0], expected,
                                   atol=1e-12)


@pytest.mark.parametrize("S,overlap", [(4, 1), (4, 2), (8, 1)])
def test_pou_and_consistent_identity(S, overlap):
    Nx = Ny = 24
    gen = diffusion2d.generate(S, Nx, Ny, overlap=overlap)
    dec = Decomposition.from_subdomains(gen.neighbors, gen.mappings,
                                        gen.n_loc, d=gen.d,
                                        renumber=False)
    gids = _global_index_map(gen)

    # the POU sums to one over each global dof (partition of unity)
    acc = np.zeros(Nx * Ny)
    d_np = np.asarray(dec.d)
    for s in range(S):
        np.add.at(acc, gids[s], d_np[s, : gen.n_loc[s]])
    np.testing.assert_allclose(acc, 1.0, atol=1e-12)

    # a consistent vector (same value on every copy) is a fixed point of the
    # scaled exchange
    rng = np.random.default_rng(5)
    g = rng.normal(size=Nx * Ny)
    x = np.zeros((dec.S, dec.n_max, 1))
    for s in range(S):
        x[s, : gen.n_loc[s], 0] = g[gids[s]]
    out = np.asarray(scaled_exchange(dec, jnp.asarray(x)))
    for s in range(S):
        np.testing.assert_allclose(out[s, : gen.n_loc[s], 0], g[gids[s]],
                                   atol=1e-12)

    # POU-weighted dot equals the true global dot
    h = rng.normal(size=Nx * Ny)
    y = np.zeros_like(x)
    for s in range(S):
        y[s, : gen.n_loc[s], 0] = h[gids[s]]
    dot = np.asarray(weighted_dot(dec, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(dot[0], g @ h, rtol=1e-12)
    nrm = np.asarray(weighted_norm_sq(dec, jnp.asarray(x)))
    np.testing.assert_allclose(nrm[0], g @ g, rtol=1e-12)


def test_multiplicity_scaling_default():
    gen = diffusion2d.generate(4, 16, 16, overlap=1)
    dec = Decomposition.from_subdomains(gen.neighbors, gen.mappings,
                                        gen.n_loc, d=None,
                                        renumber=False)  # 1/multiplicity
    gids = _global_index_map(gen)
    acc = np.zeros(16 * 16)
    d_np = np.asarray(dec.d)
    for s in range(4):
        np.add.at(acc, gids[s], d_np[s, : gen.n_loc[s]])
    np.testing.assert_allclose(acc, 1.0, atol=1e-12)
