"""2D linear elasticity with heterogeneous coefficients.

The reference's headline GenEO workloads are heterogeneous elasticity
problems (README.md:42-45 papers; BASELINE config 4: "linear elasticity
with two-level RAS + Block GMRES; heterogeneous coefficients"). This model
assembles plane-stress Q1 elasticity on an Nx x Ny node grid (2 dofs per
node, clamped at x = 0) with a checkerboard Young's modulus of given
contrast, then decomposes algebraically (models/fromfile) — the same
pipeline an HPDDM user drives through generateFromFile + METIS.

Also provides the per-subdomain *unassembled Neumann* matrices (element
sums restricted to each subdomain) needed by GenEO, and rigid-body modes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import scipy.sparse as sp

from hpddm_tpu.core.csr import MatrixCSR
from hpddm_tpu.models import fromfile


def q1_stiffness(E: float, nu: float, h: float) -> np.ndarray:
    """8x8 plane-stress Q1 element stiffness (2x2 Gauss)."""
    D = E / (1.0 - nu * nu) * np.array([[1.0, nu, 0.0],
                                        [nu, 1.0, 0.0],
                                        [0.0, 0.0, (1.0 - nu) / 2.0]])
    gp = np.array([-1.0, 1.0]) / np.sqrt(3.0)
    Ke = np.zeros((8, 8))
    for xi in gp:
        for eta in gp:
            dN = 0.25 * np.array([
                [-(1 - eta), (1 - eta), (1 + eta), -(1 + eta)],
                [-(1 - xi), -(1 + xi), (1 + xi), (1 - xi)]])
            J = h / 2.0
            dNxy = dN / J
            B = np.zeros((3, 8))
            B[0, 0::2] = dNxy[0]
            B[1, 1::2] = dNxy[1]
            B[2, 0::2] = dNxy[1]
            B[2, 1::2] = dNxy[0]
            Ke += B.T @ D @ B * (J * J)
    return Ke


def generate(n_subdomains: int, Nx: int = 40, Ny: int = 40,
             contrast: float = 1.0e3, nu: float = 0.3,
             overlap: int = 1, checker: int = 4,
             rng: Optional[np.random.Generator] = None,
             owner_fn=None):
    """Assemble + decompose. Returns (FromFileGenerated, neumann_mats,
    rigid_body_modes).

    ``owner_fn(node_x_index) -> subdomain`` overrides the default RCM
    partition with a geometric one (x-slabs keep the local node sets
    rectangular, enabling -hpddm_local_solver banded with dense
    coupling blocks)."""
    if rng is None:
        rng = np.random.default_rng(11)
    h = 1.0 / max(Nx - 1, 1)
    n_nodes = Nx * Ny
    ndof = 2 * n_nodes
    nid = lambda i, j: j * Nx + i  # noqa: E731

    rows, cols, vals = [], [], []
    elems = []
    for j in range(Ny - 1):
        for i in range(Nx - 1):
            hard = ((i * checker // max(Nx - 1, 1))
                    + (j * checker // max(Ny - 1, 1))) % 2 == 0
            E = contrast if hard else 1.0
            Ke = q1_stiffness(E, nu, h)
            nodes = [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1),
                     nid(i, j + 1)]
            dofs = np.array([[2 * n, 2 * n + 1] for n in nodes]).ravel()
            elems.append((dofs, Ke))
            r, c = np.meshgrid(dofs, dofs, indexing="ij")
            rows.append(r.ravel())
            cols.append(c.ravel())
            vals.append(Ke.ravel())
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(ndof, ndof)).tocsr()

    # clamp x = 0 by penalization (the reference uses HPDDM_PEN penalties)
    clamped = np.zeros(ndof, dtype=bool)
    for j in range(Ny):
        clamped[2 * nid(0, j)] = clamped[2 * nid(0, j) + 1] = True
    pen = 1.0e8 * abs(A).max()
    A = A + sp.diags(pen * clamped.astype(np.float64))
    A = sp.csr_matrix(A)

    f_global = np.zeros(ndof)
    f_global[1::2] = -1.0          # downward load
    f_global[clamped] = 0.0

    owner = None
    if owner_fn is not None:
        node_i = np.arange(n_nodes) % Nx
        owner = np.asarray([owner_fn(int(xi)) for xi in node_i]).repeat(2)
    gen = fromfile.decompose(MatrixCSR(A), n_subdomains, overlap=overlap,
                             f_global=f_global, owner=owner)

    # unassembled Neumann matrices: sum of element matrices whose dofs all
    # live in the subdomain (GenEO's MatNeumann analogue)
    neumann = []
    for s in range(n_subdomains):
        in_set = np.zeros(ndof, dtype=bool)
        in_set[gen.gids[s]] = True
        l_of = {g: i for i, g in enumerate(gen.gids[s])}
        n_s = gen.n_loc[s]
        r_l, c_l, v_l = [], [], []
        for dofs, Ke in elems:
            if in_set[dofs].all():
                ld = np.array([l_of[d] for d in dofs])
                r, c = np.meshgrid(ld, ld, indexing="ij")
                r_l.append(r.ravel())
                c_l.append(c.ravel())
                v_l.append(Ke.ravel())
        if r_l:
            Ns = sp.coo_matrix((np.concatenate(v_l),
                                (np.concatenate(r_l), np.concatenate(c_l))),
                               shape=(n_s, n_s)).tocsr()
        else:
            Ns = sp.identity(n_s, format="csr")
        # keep the clamping consistent on subdomains containing the edge
        loc_clamped = clamped[gen.gids[s]]
        Ns = sp.csr_matrix(Ns + sp.diags(pen * loc_clamped.astype(float)))
        neumann.append(MatrixCSR(Ns))

    # rigid-body modes per subdomain (for FETI / coarse spaces)
    rbm = []
    for s in range(n_subdomains):
        g = gen.gids[s]
        node = g // 2
        comp = g % 2
        x = (node % Nx) * h
        y = (node // Nx) * h
        m = np.zeros((gen.n_loc[s], 3))
        m[comp == 0, 0] = 1.0
        m[comp == 1, 1] = 1.0
        m[comp == 0, 2] = -y[comp == 0]
        m[comp == 1, 2] = x[comp == 1]
        rbm.append(m)

    return gen, neumann, rbm
