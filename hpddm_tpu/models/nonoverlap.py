"""Non-overlapping decompositions for substructuring (FETI / BDD).

The reference's FETI/BDD layer (include/HPDDM_schur.hpp / _FETI.hpp /
_BDD.hpp) consumes non-overlapping decompositions with duplicated interface
unknowns and local *Neumann* matrices K_s such that A = sum_s R_s^T K_s R_s
(unsigned subdomain assembly). In-tree the reference has no FETI example
driver (those come from FreeFEM); this model provides the equivalent
workload: the 2D 5-point Dirichlet Laplacian on an Nx x Ny grid, with
*edges* (the "elements" of the grid graph) partitioned into boxes, so the
subdomain matrices are exact element-wise splittings of A.

Each edge (u, v) contributes [[w, -w], [-w, w]]; edges to eliminated
Dirichlet boundary nodes contribute w to the diagonal of their interior
endpoint. Subdomain node sets are the endpoints of their edges; nodes
reached by edges of several subdomains are the interface (duplicated, with
aligned mapping lists sorted by global id — the pairing property
HPDDM_subdomain.hpp relies on).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np
import scipy.sparse as sp

from hpddm_tpu.core.csr import MatrixCSR


@dataclasses.dataclass
class NonOverlapGenerated:
    mats: List[MatrixCSR]            # local Neumann matrices K_s
    neighbors: List[List[int]]
    mappings: List[List[np.ndarray]]
    f: List[np.ndarray]              # split RHS: sum_s R_s^T f_s = f_global
    n_loc: List[int]
    gids: List[np.ndarray]           # local -> global node ids (validation)
    A_global: sp.csr_matrix          # assembled global matrix (validation)
    f_global: np.ndarray
    interface_mask: List[np.ndarray]  # bool per local dof
    # banded local mode (-hpddm_substructuring_local banded): row-major
    # local grid shapes and analytic kernels (constants on floating
    # subdomains, None on those pinned by the global Dirichlet boundary)
    grid_shapes: List[tuple] = None
    kernels: List = None
    slot_maps: List = None           # local row -> iy*wx+ix box slot


def generate(size_world: int, Nx: int = 30, Ny: int = 30,
             contrast: float = 1.0, checker: int = 4,
             dtype=np.float64) -> NonOverlapGenerated:
    """Edge-partitioned 2D Dirichlet diffusion over size_world boxes.

    contrast > 1 gives a checkerboard coefficient field (the heterogeneous
    regime GenEO coarse spaces are built for)."""
    x_grid = int(np.sqrt(size_world))
    while size_world % x_grid != 0:
        x_grid -= 1
    y_grid = size_world // x_grid

    def box_of(i, j):
        bx = min(i * x_grid // Nx, x_grid - 1)
        by = min(j * y_grid // Ny, y_grid - 1)
        return by * x_grid + bx

    def coeff(i, j):
        if contrast == 1.0:
            return 1.0
        hard = ((i * checker // Nx) + (j * checker // Ny)) % 2 == 0
        return contrast if hard else 1.0

    N = Nx * Ny
    gid = lambda i, j: j * Nx + i  # noqa: E731

    # per-subdomain COO triplets over global ids, then compress
    tri: List[Dict[str, list]] = [dict(r=[], c=[], v=[]) for _ in range(size_world)]

    def add_edge(s, u, v, w):
        tri[s]["r"] += [u, v, u, v]
        tri[s]["c"] += [u, v, v, u]
        tri[s]["v"] += [w, w, -w, -w]

    def add_diag(s, u, w):
        tri[s]["r"].append(u)
        tri[s]["c"].append(u)
        tri[s]["v"].append(w)

    for j in range(Ny):
        for i in range(Nx):
            u = gid(i, j)
            s_u = box_of(i, j)
            w = coeff(i, j)
            # right edge
            if i + 1 < Nx:
                add_edge(s_u, u, gid(i + 1, j), w)
            else:
                add_diag(s_u, u, w)
            if i == 0:
                add_diag(s_u, u, w)
            # up edge
            if j + 1 < Ny:
                add_edge(s_u, u, gid(i, j + 1), w)
            else:
                add_diag(s_u, u, w)
            if j == 0:
                add_diag(s_u, u, w)

    # global operator for validation
    rows = np.concatenate([t["r"] for t in tri])
    cols = np.concatenate([t["c"] for t in tri])
    vals = np.concatenate([t["v"] for t in tri])
    A_global = sp.coo_matrix((vals, (rows, cols)), shape=(N, N)).tocsr()

    # localize
    mats, gids, n_loc = [], [], []
    node_sets = []
    for s in range(size_world):
        nodes = np.unique(np.array(tri[s]["r"], dtype=np.int64))
        node_sets.append(set(nodes.tolist()))
        gids.append(nodes)
        n_loc.append(len(nodes))
        l_of = {g: k for k, g in enumerate(nodes)}
        lr = np.array([l_of[g] for g in tri[s]["r"]])
        lc = np.array([l_of[g] for g in tri[s]["c"]])
        K = sp.coo_matrix((np.array(tri[s]["v"], dtype=dtype), (lr, lc)),
                          shape=(len(nodes), len(nodes))).tocsr()
        mats.append(MatrixCSR(K))

    # multiplicity and interface
    count = np.zeros(N, dtype=np.int64)
    for s in range(size_world):
        count[gids[s]] += 1

    neighbors: List[List[int]] = [[] for _ in range(size_world)]
    mappings: List[List[np.ndarray]] = [[] for _ in range(size_world)]
    for s in range(size_world):
        for q in range(size_world):
            if q == s:
                continue
            shared = sorted(node_sets[s] & node_sets[q])
            if shared:
                neighbors[s].append(q)
                l_of = {g: k for k, g in enumerate(gids[s])}
                mappings[s].append(np.array([l_of[g] for g in shared],
                                            dtype=np.int64))

    # split RHS: interface entries divided by multiplicity
    rng = np.random.default_rng(7)
    f_global = np.asarray(rng.normal(size=N), dtype=dtype)
    f = []
    interface_mask = []
    for s in range(size_world):
        fs = f_global[gids[s]] / count[gids[s]]
        f.append(fs.astype(dtype))
        interface_mask.append(count[gids[s]] > 1)

    # banded local mode metadata: local grids are rectangles in row-major
    # order (gids ascending = row-major over the bounding box); kernels are
    # the constants exactly when K_s annihilates them (floating subdomains)
    grid_shapes = []
    kernels = []
    slot_maps = []
    for s in range(size_world):
        iy, ix = gids[s] // Nx, gids[s] % Nx
        wy = int(iy.max() - iy.min() + 1)
        wx = int(ix.max() - ix.min() + 1)
        grid_shapes.append((wy, wx))
        slot_maps.append((iy - iy.min()) * wx + (ix - ix.min()))
        K = mats[s].scipy(expand=True)
        ones = np.ones(n_loc[s])
        if np.abs(K @ ones).max() <= 1e-10 * np.abs(K.diagonal()).max():
            kernels.append(ones[:, None] / np.sqrt(n_loc[s]))
        else:
            kernels.append(None)

    return NonOverlapGenerated(mats=mats, neighbors=neighbors,
                               mappings=mappings, f=f, n_loc=n_loc,
                               gids=gids, A_global=A_global,
                               f_global=f_global,
                               interface_mask=interface_mask,
                               grid_shapes=grid_shapes, kernels=kernels,
                               slot_maps=slot_maps)
