"""FFT (DST-I) fast local solver for grid subdomains.

The reference's local solves are O(n^1.5)-O(n^2) sparse direct
factorizations (MUMPS & co.); batched dense inverses (ops/local_solve.py)
cap local sizes at ~10k dofs. For *structured grid* subdomains, the TPU
alternative is a fast Poisson solver: the local 5-point operator with
Dirichlet-type artificial boundaries diagonalizes in the 2D DST-I basis,
so a local solve is two batched FFTs + an eigenvalue divide —
O(n log n), fully parallel, no factorization memory at all.

When the local matrix is exactly the constant-coefficient 5-point stencil
the solve is exact; otherwise (clamped-overlap quirks, variable
coefficients) it is a spectrally-close approximation — perfectly usable as
the Schwarz smoother (the Krylov outer iteration absorbs the difference).

Subdomains are grouped by (wy, wx); each group is batched (FFT lengths
must match). DST-I of length m is computed via the imaginary part of an
rFFT of the odd extension (length 2(m+1)).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def dst1(x: jax.Array, axis: int = -1) -> jax.Array:
    """Unnormalized DST-I along `axis`: X_k = sum_i x_i sin(pi (i+1)(k+1)/(m+1))."""
    x = jnp.moveaxis(x, axis, -1)
    m = x.shape[-1]
    ext = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), x.dtype), x,
         jnp.zeros(x.shape[:-1] + (1,), x.dtype), -x[..., ::-1]], axis=-1)
    X = -jnp.fft.rfft(ext, axis=-1).imag[..., 1: m + 1] / 2.0
    return jnp.moveaxis(X.astype(x.dtype), -1, axis)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FFTLocalSolver:
    """Per-group DST-based solver. Groups are static (built at setup)."""
    # one entry per group: inverse eigenvalues (g, wy, wx)
    inv_eigs: Tuple[jax.Array, ...]
    # static: group -> (member subdomain indices, wy, wx)
    members: tuple = dataclasses.field(metadata=dict(static=True))
    shapes: tuple = dataclasses.field(metadata=dict(static=True))
    n_max: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))

    def solve(self, b: jax.Array) -> jax.Array:
        """b: (S, n_max, mu) -> A^-1 b (approximate for non-separable A)."""
        out = jnp.zeros_like(b)
        mu = b.shape[-1]
        for g, (mem, (wy, wx)) in enumerate(zip(self.members, self.shapes)):
            idx = jnp.asarray(mem)
            sub = b[idx, : wy * wx, :].reshape(len(mem), wy, wx, mu)
            # DST along both grid axes, divide by eigenvalues, transform back
            t = dst1(dst1(sub, axis=1), axis=2)
            t = t * self.inv_eigs[g][:, :, :, None]
            u = dst1(dst1(t, axis=1), axis=2)
            # DST-I is self-inverse up to 2/(m+1) per axis
            u = u * (4.0 / ((wy + 1) * (wx + 1)))
            out = out.at[idx, : wy * wx, :].set(
                u.reshape(len(mem), wy * wx, mu))
        return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DSTMatmulSolver:
    """Per-subdomain DST-I solver as batched masked sine matmuls.

    TPU-first alternative to the grouped-rFFT path: the DST-I of length
    w is a (symmetric) sine-matrix product, so the whole local solve is
    four batched matmuls + an eigenvalue divide — uniform static shapes
    for *every* subdomain regardless of its box size. All leaves are
    S-leading, so the solver shards along the subdomain mesh axis with
    the rest of the state (parallel/mesh.py state_pspecs) and runs under
    shard_map unchanged; the grouped FFTLocalSolver cannot (its group
    member indices are global). Matmul DSTs are O(w^3) per subdomain per
    axis but ride the MXU, which beats FFT shuffles for moderate boxes.
    """
    Uy: jax.Array         # (S, wy_max, wy_max) masked sine matrices
    Ux: jax.Array         # (S, wx_max, wx_max)
    inv_eigs: jax.Array   # (S, wy_max, wx_max), self-inverse scale folded in
    idx_fwd: jax.Array    # (S, wy_max*wx_max) flat row per padded-grid slot
    msk_fwd: jax.Array    # (S, wy_max*wx_max, 1) 0/1
    idx_inv: jax.Array    # (S, n_max) padded-grid slot per flat row
    msk_inv: jax.Array    # (S, n_max, 1) 0/1
    wy_max: int = dataclasses.field(metadata=dict(static=True))
    wx_max: int = dataclasses.field(metadata=dict(static=True))
    n_max: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))

    def solve(self, b: jax.Array) -> jax.Array:
        """b: (S, n_max, mu) -> A^-1 b, uniform-shape batched."""
        S, _, mu = b.shape
        g = jnp.take_along_axis(b, self.idx_fwd[:, :, None], axis=1)
        g = (g * self.msk_fwd).reshape(S, self.wy_max, self.wx_max, mu)
        t = jnp.einsum("syi,sixm->syxm", self.Uy, g)
        t = jnp.einsum("sxj,syjm->syxm", self.Ux, t)
        t = t * self.inv_eigs[:, :, :, None]
        u = jnp.einsum("syi,sixm->syxm", self.Uy, t)
        u = jnp.einsum("sxj,syjm->syxm", self.Ux, u)
        u = u.reshape(S, self.wy_max * self.wx_max, mu)
        out = jnp.take_along_axis(u, self.idx_inv[:, :, None], axis=1)
        return out * self.msk_inv


def _build_matmul(boxes, Nx: int, Ny: int, n_max: int,
                  dtype) -> DSTMatmulSolver:
    dx, dy = 10.0 / Nx, 10.0 / Ny
    S = len(boxes)
    wy_max = max(j1 - j0 for (_, _, j0, j1) in boxes)
    wx_max = max(i1 - i0 for (i0, i1, _, _) in boxes)
    Uy = np.zeros((S, wy_max, wy_max))
    Ux = np.zeros((S, wx_max, wx_max))
    inv = np.zeros((S, wy_max, wx_max))
    idx_fwd = np.zeros((S, wy_max * wx_max), dtype=np.int32)
    msk_fwd = np.zeros((S, wy_max * wx_max, 1))
    idx_inv = np.zeros((S, n_max), dtype=np.int32)
    msk_inv = np.zeros((S, n_max, 1))
    for s, (i0, i1, j0, j1) in enumerate(boxes):
        wy, wx = j1 - j0, i1 - i0
        ky = np.arange(1, wy + 1)
        kx = np.arange(1, wx + 1)
        Uy[s, :wy, :wy] = np.sin(np.pi * np.outer(ky, ky) / (wy + 1))
        Ux[s, :wx, :wx] = np.sin(np.pi * np.outer(kx, kx) / (wx + 1))
        lam_y = (2.0 - 2.0 * np.cos(np.pi * ky / (wy + 1))) / (dy * dy)
        lam_x = (2.0 - 2.0 * np.cos(np.pi * kx / (wx + 1))) / (dx * dx)
        lam = lam_y[:, None] + lam_x[None, :]
        inv[s, :wy, :wx] = (4.0 / ((wy + 1) * (wx + 1))) / lam
        iy, ix = np.meshgrid(np.arange(wy), np.arange(wx), indexing="ij")
        slot = iy * wx_max + ix                   # padded-grid positions
        flat = iy * wx + ix                       # local flat row
        idx_fwd[s, slot.ravel()] = flat.ravel()
        msk_fwd[s, slot.ravel(), 0] = 1.0
        idx_inv[s, flat.ravel()] = slot.ravel()
        msk_inv[s, flat.ravel(), 0] = 1.0
    return DSTMatmulSolver(
        Uy=jnp.asarray(Uy, dtype=dtype), Ux=jnp.asarray(Ux, dtype=dtype),
        inv_eigs=jnp.asarray(inv, dtype=dtype),
        idx_fwd=jnp.asarray(idx_fwd), msk_fwd=jnp.asarray(msk_fwd, dtype=dtype),
        idx_inv=jnp.asarray(idx_inv), msk_inv=jnp.asarray(msk_inv, dtype=dtype),
        wy_max=wy_max, wx_max=wx_max, n_max=n_max, S=S)


def build_fft_solver(boxes: Sequence[Tuple[int, int, int, int]],
                     Nx: int, Ny: int, n_max: int,
                     dtype=jnp.float32, mode: str = "auto"):
    """Build from the generator's subdomain boxes (iStart, iEnd, jStart,
    jEnd) on an Nx x Ny grid of [0,10]^2 (models/diffusion2d geometry).

    mode: "fft" (grouped rFFT, single-chip batched — lowest FLOPs for
    large boxes), "matmul" (uniform masked sine matmuls — MXU-friendly
    and shard_map-compatible), or "auto" (matmul for boxes up to 128 a
    side, fft beyond)."""
    if mode == "auto":
        wmax = max(max(j1 - j0, i1 - i0) for (i0, i1, j0, j1) in boxes)
        mode = "matmul" if wmax <= 128 else "fft"
    if mode == "matmul":
        return _build_matmul(boxes, Nx, Ny, n_max, dtype)
    dx, dy = 10.0 / Nx, 10.0 / Ny
    groups = {}
    for s, (i0, i1, j0, j1) in enumerate(boxes):
        groups.setdefault((j1 - j0, i1 - i0), []).append(s)
    members, shapes, inv_eigs = [], [], []
    for (wy, wx), mem in sorted(groups.items()):
        ky = np.arange(1, wy + 1)
        kx = np.arange(1, wx + 1)
        lam_y = (2.0 - 2.0 * np.cos(np.pi * ky / (wy + 1))) / (dy * dy)
        lam_x = (2.0 - 2.0 * np.cos(np.pi * kx / (wx + 1))) / (dx * dx)
        lam = lam_y[:, None] + lam_x[None, :]
        inv = jnp.asarray(np.broadcast_to(1.0 / lam, (len(mem), wy, wx)),
                          dtype=dtype)
        members.append(tuple(mem))
        shapes.append((wy, wx))
        inv_eigs.append(inv)
    S = len(boxes)
    return FFTLocalSolver(inv_eigs=tuple(inv_eigs), members=tuple(members),
                          shapes=tuple(shapes), n_max=n_max, S=S)
