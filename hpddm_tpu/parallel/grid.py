"""Structured-grid halo exchange: the scatter-free fast path.

The general ``exchange`` (parallel/ops.py) must handle arbitrary
decompositions, which costs three irregular row operations per call
(interface gather, partner-slab gather, scatter-back) — measured ~3x the
SpMV time on TPU at production sizes (PERF.md). For 2D grid
decompositions with *uniform* boxes (models/diffusion2d
``uniform_boxes=True``), the duplicated unknowns are exactly the
box-boundary strips, so the whole reduction is expressible with static
slices, eight S-axis row gathers (contiguous, regular), and adds —
nothing irregular anywhere. This is the TPU-native analogue of the
reference's ``Subdomain::exchange`` point-to-point halo swap
(HPDDM_subdomain.hpp:115-130) specialized the way distributed stencil
codes do it on device meshes.

Neighbor strips are padded to width ``t = 3*overlap`` (edge boxes are
extended inward to stay uniform, which widens their shared region to
3*overlap; interior pairs share 2*overlap) and re-aligned per subdomain
with a cheap narrow take_along_axis. When sharded, the four strip
tensors are all_gathered over the mesh axis (tiny: perimeter data only)
and neighbor ids index the global S axis, exactly like the general
path's partner slab.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# direction order: E, W, N, S, NE, NW, SE, SW
_DIRS = ((0, 1), (0, -1), (-1, 0), (1, 0), (-1, 1), (-1, -1), (1, 1), (1, -1))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridPlan:
    """Static halo-exchange plan for a uniform-box 2D grid decomposition."""
    nbr: jax.Array    # (S, 8) int32 neighbor subdomain id; sentinel = S
    sxw: jax.Array    # (S, 8) int32 shared width along x with that neighbor
    syw: jax.Array    # (S, 8) int32 shared width along y
    H: int = dataclasses.field(metadata=dict(static=True))
    W: int = dataclasses.field(metadata=dict(static=True))
    t: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))


def build_grid_plan(boxes) -> Optional[GridPlan]:
    """Build a plan from subdomain boxes; None if the decomposition is not
    a uniform-box aligned grid (the general exchange handles it instead).
    The strip width t is the widest pair overlap (2*overlap for interior
    pairs, 3*overlap where edge boxes were extended inward)."""
    S = len(boxes)
    ws = {(i1 - i0, j1 - j0) for (i0, i1, j0, j1) in boxes}
    if len(ws) != 1:
        return None
    (W, H), = ws
    # recover the process grid from box origins
    xs = sorted({b[0] for b in boxes})
    ys = sorted({b[2] for b in boxes})
    if len(xs) * len(ys) != S:
        return None
    # only adjacent grid cells may overlap (otherwise strips can't cover)
    if any(xs[i + 2] < xs[i] + W for i in range(len(xs) - 2)):
        return None
    if any(ys[i + 2] < ys[i] + H for i in range(len(ys) - 2)):
        return None
    pos = {(b[2], b[0]): s for s, b in enumerate(boxes)}
    gx = {x: ix for ix, x in enumerate(xs)}
    gy = {y: iy for iy, y in enumerate(ys)}
    t = 0
    for i in range(len(xs) - 1):
        t = max(t, xs[i] + W - xs[i + 1])
    for i in range(len(ys) - 1):
        t = max(t, ys[i] + H - ys[i + 1])
    if t <= 0 or W <= t or H <= t:
        return None
    nbr = np.full((S, 8), S, dtype=np.int32)
    sxw = np.zeros((S, 8), dtype=np.int32)
    syw = np.zeros((S, 8), dtype=np.int32)
    for s, (i0, i1, j0, j1) in enumerate(boxes):
        ix, iy = gx[i0], gy[j0]
        for dir_, (dy, dx) in enumerate(_DIRS):
            jx, jy = ix + dx, iy + dy
            if not (0 <= jx < len(xs) and 0 <= jy < len(ys)):
                continue
            q = pos[(ys[jy], xs[jx])]
            qi0, qi1, qj0, qj1 = boxes[q]
            ox = min(i1, qi1) - max(i0, qi0)      # shared extent along x
            oy = min(j1, qj1) - max(j0, qj0)
            if ox <= 0 or oy <= 0:
                continue
            nbr[s, dir_] = q
            sxw[s, dir_] = ox if dx else W
            syw[s, dir_] = oy if dy else H
    return GridPlan(nbr=jnp.asarray(nbr), sxw=jnp.asarray(sxw),
                    syw=jnp.asarray(syw), H=H, W=W, t=t, S=S)


def _shift_axis(vals: jax.Array, idx: jax.Array, axis: int) -> jax.Array:
    """Re-align a gathered strip: vals[..., i, ...] <- vals[..., idx, ...]
    along `axis`, zero where idx is out of [0, extent)."""
    extent = vals.shape[axis]
    shape = [1] * vals.ndim
    shape[0], shape[axis] = idx.shape[0], idx.shape[1]
    idx_b = idx.reshape(shape)
    ok = (idx_b >= 0) & (idx_b < extent)
    taken = jnp.take_along_axis(
        vals, jnp.broadcast_to(jnp.clip(idx_b, 0, extent - 1), vals.shape),
        axis=axis)
    return jnp.where(jnp.broadcast_to(ok, vals.shape), taken, 0)


def grid_exchange(plan: GridPlan, x: jax.Array,
                  axis_name: Optional[str] = None) -> jax.Array:
    """Sum-reduce duplicated unknowns on a uniform grid decomposition."""
    S_loc, n_max, mu = x.shape
    H, W, t = plan.H, plan.W, plan.t
    x4 = x[:, : H * W, :].reshape(S_loc, H, W, mu)

    Est = x4[:, :, W - t:, :]
    Wst = x4[:, :, :t, :]
    Nst = x4[:, :t, :, :]
    Sst = x4[:, H - t:, :, :]
    if axis_name is not None:
        Est = lax.all_gather(Est, axis_name, axis=0, tiled=True)
        Wst = lax.all_gather(Wst, axis_name, axis=0, tiled=True)
        Nst = lax.all_gather(Nst, axis_name, axis=0, tiled=True)
        Sst = lax.all_gather(Sst, axis_name, axis=0, tiled=True)

    def pad(strip):
        z = jnp.zeros((1,) + strip.shape[1:], strip.dtype)
        return jnp.concatenate([strip, z], axis=0)

    Ep, Wp, Np, Sp = pad(Est), pad(Wst), pad(Nst), pad(Sst)
    r = jnp.arange(t)[None, :]

    def lo_idx(shared):        # my strip rows/cols [0, t): pos -> theirs
        return r + (t - shared[:, None])
    def hi_idx(shared):        # my strip rows/cols [X - t, X): pos -> theirs
        return r - (t - shared[:, None])

    nbr, sxw, syw = plan.nbr, plan.sxw, plan.syw
    # cardinal contributions
    e = _shift_axis(Wp[nbr[:, 0]], hi_idx(sxw[:, 0]), 2)
    w = _shift_axis(Ep[nbr[:, 1]], lo_idx(sxw[:, 1]), 2)
    n = _shift_axis(Sp[nbr[:, 2]], lo_idx(syw[:, 2]), 1)
    s = _shift_axis(Np[nbr[:, 3]], hi_idx(syw[:, 3]), 1)
    # diagonal corner tiles (sliced out of the neighbor's strip tensors)
    ne = _shift_axis(_shift_axis(Sp[nbr[:, 4]][:, :, :t, :],
                                 lo_idx(syw[:, 4]), 1), hi_idx(sxw[:, 4]), 2)
    nw = _shift_axis(_shift_axis(Sp[nbr[:, 5]][:, :, W - t:, :],
                                 lo_idx(syw[:, 5]), 1), lo_idx(sxw[:, 5]), 2)
    se = _shift_axis(_shift_axis(Np[nbr[:, 6]][:, :, :t, :],
                                 hi_idx(syw[:, 6]), 1), hi_idx(sxw[:, 6]), 2)
    sw = _shift_axis(_shift_axis(Np[nbr[:, 7]][:, :, W - t:, :],
                                 hi_idx(syw[:, 7]), 1), lo_idx(sxw[:, 7]), 2)

    # fold corner tiles into the (narrow) E/W strips, then compose the
    # result as one fused elementwise pass over zero-padded strips (faster
    # on TPU than dynamic-update-slice write-backs, measured; PERF.md)
    e = e.at[:, :t, :, :].add(ne).at[:, H - t:, :, :].add(se)
    w = w.at[:, :t, :, :].add(nw).at[:, H - t:, :, :].add(sw)
    x4 = (x4
          + jnp.pad(e, [(0, 0), (0, 0), (W - t, 0), (0, 0)])
          + jnp.pad(w, [(0, 0), (0, 0), (0, W - t), (0, 0)])
          + jnp.pad(n, [(0, 0), (0, H - t), (0, 0), (0, 0)])
          + jnp.pad(s, [(0, 0), (H - t, 0), (0, 0), (0, 0)]))

    out = x4.reshape(S_loc, H * W, mu)
    if n_max > H * W:
        out = jnp.concatenate([out, x[:, H * W:, :]], axis=1)
    return out
