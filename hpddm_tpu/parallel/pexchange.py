"""Pallas static-gather exchange for the general (unstructured) path.

The role of the reference's point-to-point halo reduction
(Subdomain::exchange, include/HPDDM_subdomain.hpp:115-130) on a single
chip's batched layout.  The general exchange is three element-granular
index ops (interface
gather, partner gather, write-back scatter) that XLA lowers element-serial
on TPU (~10 ns/element): 591 us at 65k dofs/16 subdomains against a ~30 us
grid-path exchange (tools/bench_unstructured.py, round 5).

All three index maps are *static* (fixed by the decomposition), so they
compile into Mosaic's in-register lane gather (~2.5 ps/element,
tools/exp_pallas_gather.py) with a per-128-tile select loop for the
window dimension:

  pass 1 (extract):   vals[s, p] = x[s, if_idx[s, p]]
  pass 2 (reduce+wb): summed[p] = vals[p] + sum_k vals_flat[partners[p,k]]
                      y[s, i]   = is_if[i] ? summed[inv[i]] : x[s, i]

Pass 2 keeps the *entire* compact interface array (S, m_pad) resident in
VMEM (it is tiny — S * m * 4 bytes), which is what makes the
cross-subdomain reduction a local gather.  Single-device batched layout
only (``axis_name is None``); sharded meshes keep the XLA path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasExchangePlan:
    ifloc: jax.Array    # (S, m_tiles, 128) int32 local flat idx per slot
    ifmask: jax.Array   # (S, m_tiles, 128) f32 slot validity
    ploc: jax.Array     # (S, k_max, m_tiles, 128) int32 packed partner id
    #                     in the *neighbor-compacted* space r*m_pad + j
    pmask: jax.Array    # (S, k_max, m_tiles, 128) f32
    invloc: jax.Array   # (S, n_tiles, 128) int32 slot id per local dof
    invmask: jax.Array  # (S, n_tiles, 128) f32
    # neighbor slab compaction: partner values only live in deg_max
    # neighbor subdomains; one XLA row-granular gather shrinks the
    # kernel's partner window from S*m_tiles to deg_max*m_tiles tiles
    nbr_ids: jax.Array  # (S, deg_max) int32 neighbor subdomain ids
    n_tiles: int = dataclasses.field(metadata=dict(static=True))
    m_tiles: int = dataclasses.field(metadata=dict(static=True))
    k_max: int = dataclasses.field(metadata=dict(static=True))
    n_max: int = dataclasses.field(metadata=dict(static=True))
    deg_max: int = dataclasses.field(default=0, metadata=dict(static=True))


def build_plan(dec) -> Optional[PallasExchangePlan]:
    """Build the kernel's static index maps from a Decomposition."""
    S, n_max, m_max = dec.S, dec.n_max, dec.m_max
    if m_max == 0:
        return None
    if_idx = np.asarray(dec.if_idx).astype(np.int64)      # (S, m_max)
    if_mask = np.asarray(dec.if_mask)
    partners = np.asarray(dec.partners).astype(np.int64)  # (S, m_max, k)
    k_max = partners.shape[2] if partners.ndim == 3 else 0
    n_tiles = -(-n_max // 128)
    m_tiles = -(-m_max // 128)
    m_pad = m_tiles * 128

    ifloc = np.zeros((S, m_pad), dtype=np.int64)
    ifloc[:, :m_max] = np.where(if_mask, if_idx, 0)
    ifmask = np.zeros((S, m_pad), dtype=np.float32)
    ifmask[:, :m_max] = if_mask.astype(np.float32)

    # partner ids are q * m_max + j (sentinel S * m_max); repack to the
    # *neighbor-compacted* slot space r * m_pad + j, where r is q's rank
    # in this subdomain's neighbor list — the kernel then only walks
    # deg_max neighbor slabs instead of all S
    sentinel = S * m_max
    q = partners // m_max
    j = partners - q * m_max
    valid = partners != sentinel
    nbr_lists = [np.unique(q[s][valid[s]]) for s in range(S)]
    deg_max = max((len(v) for v in nbr_lists), default=0)
    deg_max = max(deg_max, 1)
    nbr_ids = np.zeros((S, deg_max), dtype=np.int64)
    rank_of = np.zeros((S, S), dtype=np.int64)
    for s in range(S):
        v = nbr_lists[s]
        nbr_ids[s, : len(v)] = v
        nbr_ids[s, len(v):] = s        # pad with self (values unused)
        rank_of[s, v] = np.arange(len(v))
    r = np.take_along_axis(rank_of, np.where(valid, q, 0).reshape(S, -1),
                           axis=1).reshape(q.shape)
    ploc_c = np.where(valid, r * m_pad + j, 0)
    ploc = np.zeros((S, k_max, m_pad), dtype=np.int64)
    pmask = np.zeros((S, k_max, m_pad), dtype=np.float32)
    ploc[:, :, :m_max] = np.transpose(ploc_c, (0, 2, 1))
    pmask[:, :, :m_max] = np.transpose(valid, (0, 2, 1)).astype(np.float32)

    # inverse map local dof -> slot (sentinel handled by mask)
    inv = np.asarray(dec.inv_map).astype(np.int64)        # (S, n_max)
    is_if = np.asarray(dec.is_if)
    n_pad = n_tiles * 128
    invloc = np.zeros((S, n_pad), dtype=np.int64)
    invloc[:, :n_max] = np.where(is_if, np.minimum(inv, m_pad - 1), 0)
    invmask = np.zeros((S, n_pad), dtype=np.float32)
    invmask[:, :n_max] = is_if.astype(np.float32)

    def tiles(a, nt):
        return jnp.asarray(a.reshape(a.shape[:-1] + (nt, 128))
                           .astype(np.int32))

    return PallasExchangePlan(
        ifloc=tiles(ifloc, m_tiles),
        ifmask=jnp.asarray(ifmask.reshape(S, m_tiles, 128)),
        ploc=tiles(ploc, m_tiles),
        pmask=jnp.asarray(pmask.reshape(S, k_max, m_tiles, 128)),
        invloc=tiles(invloc, n_tiles),
        invmask=jnp.asarray(invmask.reshape(S, n_pad // 128, 128)),
        nbr_ids=jnp.asarray(nbr_ids.astype(np.int32)),
        n_tiles=n_tiles, m_tiles=m_tiles, k_max=k_max, n_max=n_max,
        deg_max=deg_max)


# window tiles processed per grid step: bounds the unrolled loop body's
# live temporaries (the one-shot formulation blew the 16 MB scoped-vmem
# stack at 1M dofs: 26.3 MB of (n_tiles, 128) broadcasts)
_TC = 64


def _chunk_gather_acc(acc, src_chunk, loc, c0, nt, dtype):
    """acc += gather from one window chunk: src_chunk (nt, 128) holds
    window tiles [c0, c0 + nt); loc addresses the *global* window."""
    lane = jax.lax.rem(loc, jnp.int32(128))
    tile = jax.lax.div(loc, jnp.int32(128))
    out_tiles = loc.shape[0]
    for tt in range(nt):
        srcb = jnp.broadcast_to(src_chunk[tt: tt + 1, :], (out_tiles, 128))
        g = jnp.take_along_axis(srcb, lane, axis=1)
        acc = acc + jnp.where(tile == c0 + tt, g, 0.0)
    return acc


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _pexchange(x: jax.Array, ifloc, ifmask, ploc, pmask, invloc, invmask,
               nbr_ids, geom, interpret: bool = False) -> jax.Array:
    """x: (S, n) -> exchanged (S, n).  geom = (n_tiles, m_tiles, k_max).

    Three chunked kernels (each grid dim c walks window chunks of _TC
    tiles, accumulating into a revisited output block):
      1. extract: vals[s, p] = x[s, if_idx[s, p]]
      2. reduce:  summed[p]  = vals[p] + sum_k vals_flat[partners[p, k]]
      3. merge:   y[s, i]    = is_if[i] ? summed[inv[i]] : x[s, i]
    """
    n_tiles, m_tiles, k_max = geom
    S, n = x.shape
    xp = jnp.pad(x, ((0, 0), (0, n_tiles * 128 - n))) \
        .reshape(S, n_tiles, 128)
    nxc = -(-n_tiles // _TC)                  # x window chunks
    n_pad_t = nxc * _TC
    xpc = jnp.pad(xp, ((0, 0), (0, n_pad_t - n_tiles), (0, 0)))

    def k_extract(x_ref, l_ref, v_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            v_ref[0] = jnp.zeros((m_tiles, 128), dtype=v_ref.dtype)

        v_ref[0] = _chunk_gather_acc(v_ref[0], x_ref[0], l_ref[0],
                                     c * _TC, _TC, v_ref.dtype)

    vals_raw = pl.pallas_call(
        k_extract,
        out_shape=jax.ShapeDtypeStruct((S, m_tiles, 128), x.dtype),
        grid=(S, nxc),
        in_specs=[
            pl.BlockSpec((1, _TC, 128), lambda s, c: (s, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_tiles, 128), lambda s, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m_tiles, 128), lambda s, c: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xpc, ifloc)
    # where (not multiply): 0.0 * negative = -0.0 would break the bitwise
    # match with the XLA path's where(if_mask, gathered, 0)
    vals = jnp.where(ifmask != 0.0, vals_raw, 0.0)

    # reduce: per-k partner gathers accumulated over chunks of the
    # *neighbor-compacted* (deg_max*m_tiles) window — one XLA row-slice
    # gather collects each subdomain's neighbor slabs first (row-granular
    # gathers are ~free; tools/exp_gather.py).  The final sum over k runs
    # in XLA with the SAME expression as ops._interface_reduce
    # (vals + sum(., axis)), so batched Pallas == sharded XLA stays
    # bitwise identical (each partner lands in exactly one chunk; masked
    # slots add +-0)
    deg = nbr_ids.shape[1]
    DM = deg * m_tiles
    nvc = -(-DM // _TC)
    nbr_vals = vals[nbr_ids]                  # (S, deg, m_tiles, 128)
    vflat = jnp.pad(nbr_vals.reshape(S, DM, 128),
                    ((0, 0), (0, nvc * _TC - DM), (0, 0)))

    def k_reduce(vf_ref, pl_ref, o_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            o_ref[0] = jnp.zeros((k_max, m_tiles, 128), dtype=o_ref.dtype)

        for k in range(k_max):
            o_ref[0, k] = _chunk_gather_acc(
                o_ref[0, k], vf_ref[0], pl_ref[0, k], c * _TC, _TC,
                o_ref.dtype)

    pk = pl.pallas_call(
        k_reduce,
        out_shape=jax.ShapeDtypeStruct((S, k_max, m_tiles, 128), x.dtype),
        grid=(S, nvc),
        in_specs=[
            pl.BlockSpec((1, _TC, 128), lambda s, c: (s, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_max, m_tiles, 128),
                         lambda s, c: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k_max, m_tiles, 128),
                               lambda s, c: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vflat, ploc)
    summed = vals + jnp.sum(
        jnp.moveaxis(jnp.where(pmask != 0.0, pk, 0.0), 1, 3), axis=3)

    def k_merge(x_ref, sm_ref, il_ref, im_ref, o_ref):
        merged = _chunk_gather_acc(
            jnp.zeros((_TC, 128), dtype=o_ref.dtype), sm_ref[0],
            il_ref[0], 0, m_tiles, o_ref.dtype)
        o_ref[0] = jnp.where(im_ref[0] != 0.0, merged, x_ref[0])

    ilc = jnp.pad(invloc, ((0, 0), (0, n_pad_t - n_tiles), (0, 0)))
    imc = jnp.pad(invmask, ((0, 0), (0, n_pad_t - n_tiles), (0, 0)))
    out = pl.pallas_call(
        k_merge,
        out_shape=jax.ShapeDtypeStruct((S, n_pad_t, 128), x.dtype),
        grid=(S, nxc),
        in_specs=[
            pl.BlockSpec((1, _TC, 128), lambda s, c: (s, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_tiles, 128), lambda s, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TC, 128), lambda s, c: (s, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TC, 128), lambda s, c: (s, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TC, 128), lambda s, c: (s, c, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xpc, summed, ilc, imc)
    return out.reshape(S, n_pad_t * 128)[:, :n]


def pexchange(plan: PallasExchangePlan, x: jax.Array,
              interpret: bool = False) -> jax.Array:
    """x: (S, n_max, mu) -> exchanged, one kernel pass per RHS."""
    geom = (plan.n_tiles, plan.m_tiles, plan.k_max)
    outs = [_pexchange(x[:, :, m], plan.ifloc, plan.ifmask, plan.ploc,
                       plan.pmask, plan.invloc, plan.invmask,
                       plan.nbr_ids, geom, interpret=interpret)
            for m in range(x.shape[-1])]
    return jnp.stack(outs, axis=-1)
