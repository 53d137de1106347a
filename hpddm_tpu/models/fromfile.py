"""Algebraic decomposition of an assembled matrix (schwarzFromFile path).

Re-design of examples/generateFromFile.cpp:63-141: the reference partitions
the adjacency graph with METIS and grows each partition into an overlapping
subdomain by repeatedly multiplying the indicator by |A| (the
"overlap-growth by powers of |A|" trick). METIS is replaced by a
bandwidth-reducing ordering (reverse Cuthill-McKee) split into contiguous
blocks — adequate for the banded test matrices and fully deterministic.

Returns the same structures as models/diffusion2d.generate: local matrices,
neighbor lists with elementwise-aligned mappings (sorted by global id on
both sides), and a 1/multiplicity partition of unity.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

from hpddm_tpu.core.csr import MatrixCSR


@dataclasses.dataclass
class FromFileGenerated:
    mats: List[MatrixCSR]
    neighbors: List[List[int]]
    mappings: List[List[np.ndarray]]
    d: List[np.ndarray]            # ramp POU (0 on the outermost layer)
    n_loc: List[int]
    gids: List[np.ndarray]
    owner: np.ndarray              # (N,) owning subdomain per global dof
    A_global: sp.csr_matrix
    f: List[np.ndarray]            # restriction of the global RHS


def partition_kway(A: sp.spmatrix, k: int) -> np.ndarray:
    """k-way node partition: RCM ordering split into contiguous blocks."""
    N = A.shape[0]
    pattern = sp.csr_matrix(A, copy=True)
    pattern.data = np.ones_like(pattern.data)
    pattern = pattern + pattern.T
    perm = reverse_cuthill_mckee(sp.csr_matrix(pattern), symmetric_mode=True)
    owner = np.empty(N, dtype=np.int64)
    bounds = np.linspace(0, N, k + 1).astype(np.int64)
    for s in range(k):
        owner[perm[bounds[s]: bounds[s + 1]]] = s
    return owner


def decompose(A: MatrixCSR, n_subdomains: int, overlap: int = 1,
              f_global: Optional[np.ndarray] = None,
              owner: Optional[np.ndarray] = None) -> FromFileGenerated:
    """Build overlapping subdomains from an assembled matrix.

    Overlap growth (generateFromFile.cpp:63-141): sets grow by
    ``overlap`` rounds of the |A| adjacency.
    """
    csr = A.scipy(expand=True)
    N = csr.shape[0]
    if owner is None:
        owner = partition_kway(csr, n_subdomains)
    adj = csr.copy()
    adj.data = np.abs(adj.data)

    # overlap growth with join-round tracking: the POU ramps from 1 on the
    # owned set down to 0 on the outermost layer (generateFromFile.cpp:
    # 112-118), which is what makes GMV exact on restricted local rows.
    sets: List[np.ndarray] = []
    d_all: List[np.ndarray] = []
    for s in range(n_subdomains):
        joined = np.where(owner == s, 0, -1)
        for r in range(1, overlap + 1):
            reach = adj @ (joined >= 0).astype(np.float64)
            new = (reach > 0) & (joined < 0)
            joined[new] = r
        nodes = np.nonzero(joined >= 0)[0]
        sets.append(nodes)
        if overlap > 0:
            dv = np.where(joined[nodes] == overlap, 0.0,
                          1.0 - joined[nodes] / overlap)
        else:
            dv = np.ones(len(nodes))
        d_all.append(dv)

    mats, gids, n_loc = [], [], []
    node_sets = []
    for s in range(n_subdomains):
        nodes = sets[s]
        node_sets.append(set(nodes.tolist()))
        gids.append(nodes)
        n_loc.append(len(nodes))
        # row-then-column slicing: np.ix_ on scipy CSR densifies the
        # sampling (O(len(nodes)^2) points)
        sub = csr[nodes][:, nodes]
        mats.append(MatrixCSR(sp.csr_matrix(sub)))

    neighbors: List[List[int]] = [[] for _ in range(n_subdomains)]
    mappings: List[List[np.ndarray]] = [[] for _ in range(n_subdomains)]
    for s in range(n_subdomains):
        l_of = {g: i for i, g in enumerate(gids[s])}
        for q in range(n_subdomains):
            if q == s:
                continue
            shared = sorted(node_sets[s] & node_sets[q])
            if shared:
                neighbors[s].append(q)
                mappings[s].append(np.array([l_of[g] for g in shared],
                                            dtype=np.int64))

    f = []
    if f_global is None:
        f_global = np.ones(N)
    for s in range(n_subdomains):
        f.append(np.asarray(f_global)[gids[s]].reshape(-1, 1))

    return FromFileGenerated(mats=mats, neighbors=neighbors,
                             mappings=mappings, d=d_all, n_loc=n_loc,
                             gids=gids, owner=owner, A_global=csr, f=f)
