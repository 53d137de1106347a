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
    # (S, 8, S+1) one-hot of nbr: the S-axis neighbor "gather" is done as
    # an MXU matmul — generic gathers serialize on TPU (~54 ns/elem, PERF),
    # a (S, S+1) x (S+1, strip) matmul is ~free. S-leading so shard_map
    # splits it alongside the subdomain axis.
    onehot: jax.Array
    H: int = dataclasses.field(metadata=dict(static=True))
    W: int = dataclasses.field(metadata=dict(static=True))
    t: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))
    # regular row-major process grid (s == iy*gx + ix): neighbor selection
    # becomes a *static shift* of the (gy, gx, ...) strip tensor — no
    # matmul, no gather (the one-hot takes measured 536 us of the 589 us
    # exchange at 2048^2/16; PERF.md)
    gx: int = dataclasses.field(default=0, metadata=dict(static=True))
    gy: int = dataclasses.field(default=0, metadata=dict(static=True))
    regular: bool = dataclasses.field(default=False,
                                      metadata=dict(static=True))


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
    onehot = np.zeros((S, 8, S + 1), dtype=np.float32)
    for dir_ in range(8):
        onehot[np.arange(S), dir_, nbr[:, dir_]] = 1.0
    gx_n, gy_n = len(xs), len(ys)
    regular = all(pos.get((ys[iy], xs[ix])) == iy * gx_n + ix
                  for iy in range(gy_n) for ix in range(gx_n))
    return GridPlan(nbr=jnp.asarray(nbr), sxw=jnp.asarray(sxw),
                    syw=jnp.asarray(syw), onehot=jnp.asarray(onehot),
                    H=H, W=W, t=t, S=S,
                    gx=gx_n, gy=gy_n, regular=regular)


def _static_shift(vals: jax.Array, v: int, axis: int) -> jax.Array:
    """out[..., i, ...] = vals[..., i+v, ...], zero-filled (static v)."""
    if v == 0:
        return vals
    ext = vals.shape[axis]
    idx = [slice(None)] * vals.ndim
    pad = [(0, 0)] * vals.ndim
    if v > 0:
        idx[axis] = slice(min(v, ext), ext)
        pad[axis] = (0, min(v, ext))
    else:
        idx[axis] = slice(0, max(ext + v, 0))
        pad[axis] = (min(-v, ext), 0)
    return jnp.pad(vals[tuple(idx)], pad)


def _shift_select(vals: jax.Array, k: jax.Array, axis: int,
                  t: int) -> jax.Array:
    """out[s, ..., i, ...] = vals[s, ..., i + k[s], ...], zero outside.

    k: (S,) per-subdomain shift in [-t, t]. Computed as a select over the
    2t+1 statically-shifted variants — pure VPU, no gathers (a
    take_along_axis here serializes per element on TPU and dominated the
    whole exchange; PERF.md)."""
    variants = jnp.stack([_static_shift(vals, v, axis)
                          for v in range(-t, t + 1)])      # (2t+1, S, ...)
    sel = (k + t)[None, :] == jnp.arange(2 * t + 1)[:, None]
    sel = sel.reshape(sel.shape + (1,) * (vals.ndim - 1))
    return jnp.sum(jnp.where(sel, variants, 0), axis=0)


import os

# composition of the final canvas update: "band" = row-band concat (one
# fused pass, no zero-padded full canvases), "pad" = zero-padded strip adds
# (the round-1 formulation). A/B-switchable for measurement.
_COMPOSE = os.environ.get("HPDDM_TPU_GRID_COMPOSE", "band")


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

    sxw, syw = plan.sxw, plan.syw

    if plan.regular:
        # neighbor selection = static shift of the (gy, gx, ...) tensor
        def take(strips, dir_):
            dy, dx = _DIRS[dir_]
            g = strips.reshape((plan.gy, plan.gx) + strips.shape[1:])
            g = _static_shift(_static_shift(g, dy, 0), dx, 1)
            full = g.reshape(strips.shape)
            if axis_name is None:
                return full
            return lax.dynamic_slice_in_dim(
                full, lax.axis_index(axis_name) * S_loc, S_loc, 0)
        Ep, Wp, Np, Sp = Est, Wst, Nst, Sst
    else:
        def pad(strip):
            z = jnp.zeros((1,) + strip.shape[1:], strip.dtype)
            return jnp.concatenate([strip, z], axis=0)

        Ep, Wp, Np, Sp = pad(Est), pad(Wst), pad(Nst), pad(Sst)
        oh = plan.onehot.astype(x.dtype)

        def take(strips_p, dir_):
            # neighbor "gather" as a one-hot matmul (no generic gather)
            return jnp.einsum("sq,qabm->sabm", oh[:, dir_, :], strips_p)

    def lo(shared):            # my strip rows/cols [0, t): shift by t-shared
        return t - shared
    def hi(shared):
        return shared - t

    # cardinal contributions
    e = _shift_select(take(Wp, 0), hi(sxw[:, 0]), 2, t)
    w = _shift_select(take(Ep, 1), lo(sxw[:, 1]), 2, t)
    n = _shift_select(take(Sp, 2), lo(syw[:, 2]), 1, t)
    s = _shift_select(take(Np, 3), hi(syw[:, 3]), 1, t)
    # diagonal corner tiles (sliced out of the neighbor's strip tensors)
    ne = _shift_select(_shift_select(take(Sp, 4)[:, :, :t, :],
                                     lo(syw[:, 4]), 1, t), hi(sxw[:, 4]), 2, t)
    nw = _shift_select(_shift_select(take(Sp, 5)[:, :, W - t:, :],
                                     lo(syw[:, 5]), 1, t), lo(sxw[:, 5]), 2, t)
    se = _shift_select(_shift_select(take(Np, 6)[:, :, :t, :],
                                     hi(syw[:, 6]), 1, t), hi(sxw[:, 6]), 2, t)
    sw = _shift_select(_shift_select(take(Np, 7)[:, :, W - t:, :],
                                     hi(syw[:, 7]), 1, t), lo(sxw[:, 7]), 2, t)

    if _COMPOSE == "band":
        # Row-band concat: corner tiles and the E/W strips' corner rows
        # fold into the full-width N/S strips (tiny (S, t, W) ops), then
        # one fused pass assembles the three bands.
        n = (n.at[:, :, W - t:, :].add(ne + e[:, :t, :, :])
              .at[:, :, :t, :].add(nw + w[:, :t, :, :]))
        s = (s.at[:, :, W - t:, :].add(se + e[:, H - t:, :, :])
              .at[:, :, :t, :].add(sw + w[:, H - t:, :, :]))
        mid = jnp.concatenate([
            x4[:, t:H - t, :t, :] + w[:, t:H - t, :, :],
            x4[:, t:H - t, t:W - t, :],
            x4[:, t:H - t, W - t:, :] + e[:, t:H - t, :, :]], axis=2)
        x4 = jnp.concatenate([
            x4[:, :t, :, :] + n, mid, x4[:, H - t:, :, :] + s], axis=1)
    else:
        # zero-padded strip adds (round-1 formulation)
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
