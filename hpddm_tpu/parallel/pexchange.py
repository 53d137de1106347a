"""Pallas static-gather exchange for the general (unstructured) path.

The general exchange is three element-granular index ops (interface
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
    pmask: jax.Array    # (S, k_max, m_tiles, 128) f32
    invloc: jax.Array   # (S, n_tiles, 128) int32 slot id per local dof
    invmask: jax.Array  # (S, n_tiles, 128) f32
    n_tiles: int = dataclasses.field(metadata=dict(static=True))
    m_tiles: int = dataclasses.field(metadata=dict(static=True))
    k_max: int = dataclasses.field(metadata=dict(static=True))
    n_max: int = dataclasses.field(metadata=dict(static=True))


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
    # padded slot space q * m_pad + j
    sentinel = S * m_max
    q = partners // m_max
    j = partners - q * m_max
    valid = partners != sentinel
    ploc_c = np.where(valid, q * m_pad + j, 0)
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
        n_tiles=n_tiles, m_tiles=m_tiles, k_max=k_max, n_max=n_max)


def _window_gather(src, loc, out_tiles, win_tiles, dtype):
    """out[r, l] = src[loc[r, l] // 128, loc[r, l] % 128] via one lane
    gather + select per window tile.  src: (win_tiles, 128)."""
    lane = jax.lax.rem(loc, jnp.int32(128))
    tile = jax.lax.div(loc, jnp.int32(128))
    out = jnp.zeros((out_tiles, 128), dtype=dtype)
    for t in range(win_tiles):
        srcb = jnp.broadcast_to(src[t: t + 1, :], (out_tiles, 128))
        g = jnp.take_along_axis(srcb, lane, axis=1)
        out = out + jnp.where(tile == t, g, 0.0)
    return out


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _pexchange(x: jax.Array, ifloc, ifmask, ploc, pmask, invloc, invmask,
               geom, interpret: bool = False) -> jax.Array:
    """x: (S, n) -> exchanged (S, n).  geom = (n_tiles, m_tiles, k_max)."""
    n_tiles, m_tiles, k_max = geom
    S, n = x.shape
    xp = jnp.pad(x, ((0, 0), (0, n_tiles * 128 - n))) \
        .reshape(S, n_tiles, 128)

    def k_extract(x_ref, l_ref, m_ref, v_ref):
        v_ref[0] = _window_gather(x_ref[0], l_ref[0], m_tiles, n_tiles,
                                  v_ref.dtype) * m_ref[0]

    vals = pl.pallas_call(
        k_extract,
        out_shape=jax.ShapeDtypeStruct((S, m_tiles, 128), x.dtype),
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, n_tiles, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_tiles, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_tiles, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m_tiles, 128), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, ifloc, ifmask)

    def k_reduce(x_ref, v_ref, vown_ref, pl_ref, pm_ref, il_ref, im_ref,
                 o_ref):
        vflat = v_ref[...].reshape(S * m_tiles, 128)
        # partner sum first, then add own values — the same reduction
        # order as ops._interface_reduce (vals + sum(pvals, axis=2)), so
        # batched Pallas == sharded XLA stays bitwise identical
        psum = jnp.zeros((m_tiles, 128), dtype=o_ref.dtype)
        for k in range(k_max):
            g = _window_gather(vflat, pl_ref[0, k], m_tiles,
                               S * m_tiles, o_ref.dtype)
            psum = psum + g * pm_ref[0, k]
        summed = vown_ref[0] + psum
        merged = _window_gather(summed, il_ref[0], n_tiles, m_tiles,
                                o_ref.dtype)
        o_ref[0] = jnp.where(im_ref[0] != 0.0, merged, x_ref[0])

    out = pl.pallas_call(
        k_reduce,
        out_shape=jax.ShapeDtypeStruct((S, n_tiles, 128), x.dtype),
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, n_tiles, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, m_tiles, 128), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_tiles, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_max, m_tiles, 128), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_max, m_tiles, 128), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_tiles, 128), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, vals, vals, ploc, pmask, invloc, invmask)
    return out.reshape(S, n_tiles * 128)[:, :n]


def pexchange(plan: PallasExchangePlan, x: jax.Array,
              interpret: bool = False) -> jax.Array:
    """x: (S, n_max, mu) -> exchanged, one kernel pass per RHS."""
    geom = (plan.n_tiles, plan.m_tiles, plan.k_max)
    outs = [_pexchange(x[:, :, m], plan.ifloc, plan.ifmask, plan.ploc,
                       plan.pmask, plan.invloc, plan.invmask, geom,
                       interpret=interpret)
            for m in range(x.shape[-1])]
    return jnp.stack(outs, axis=-1)
