"""Pallas TPU kernel for the exchange write-back (merge scatter).

The exchange's cost on TPU is the irregular placement of ~m_max*S merged
interface values into the (S, n_max) vector: XLA lowers it as a generic
scatter (~1.2 ms for 65k elements at the 2048^2/16 scale). This kernel
streams the vector through VMEM in row blocks and applies each block's
slot updates with single-element dynamic-slice stores; slots are sorted by
flattened position at setup so each grid step touches a contiguous slot
range (scalar-prefetched prefix).

Host-side setup (ExchangePlan) is cached on the Decomposition by the
caller; the kernel is value-agnostic (the merged values are computed by
the cheap partner-sum XLA ops first).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScatterPlan:
    """Sorted flat positions + per-block slot prefix for merge_scatter."""
    pos: jax.Array           # (K,) int32 flat positions into (R*128,)
    order: jax.Array         # (K,) int32 — permutation from slot order
    starts: jax.Array        # (n_blocks + 1,) int32 slot prefix
    R: int = dataclasses.field(metadata=dict(static=True))
    BR: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def build(flat_pos: np.ndarray, total_elems: int,
              block_rows: int = 64) -> "ScatterPlan":
        """flat_pos: (K,) element positions into the flattened vector
        (invalid slots must point >= total_elems and are dropped)."""
        R = _round_up(total_elems, 128) // 128
        keep = flat_pos < total_elems
        kept = np.nonzero(keep)[0]
        pos = flat_pos[kept].astype(np.int64)
        order = np.argsort(pos, kind="stable")
        pos_sorted = pos[order].astype(np.int32)
        blk = (pos_sorted // (block_rows * 128)).astype(np.int64)
        n_blocks = _round_up(R, block_rows) // block_rows
        starts = np.zeros(n_blocks + 1, dtype=np.int32)
        counts = np.bincount(blk, minlength=n_blocks)
        starts[1:] = np.cumsum(counts)
        return ScatterPlan(pos=jnp.asarray(pos_sorted),
                           order=jnp.asarray(kept[order].astype(np.int32)),
                           starts=jnp.asarray(starts),
                           R=R, BR=block_rows, n_cols=128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_scatter(plan: ScatterPlan, x_flat: jax.Array, vals: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """out = x with out.flat[plan.pos[i]] = vals_sorted[i].

    x_flat: (N,) flattened vector; vals: per-slot values in the *original*
    slot order (plan.order maps to sorted order)."""
    N = x_flat.shape[0]
    R, BR = plan.R, plan.BR
    R_pad = _round_up(R, BR)
    x2 = jnp.pad(x_flat, (0, R_pad * 128 - N)).reshape(R_pad, 128)
    vals_sorted = vals[plan.order]
    n_blocks = R_pad // BR
    K = plan.pos.shape[0]

    def kernel(starts_ref, pos_ref, val_ref, x_ref, out_ref):
        # one-hot accumulate: Mosaic rejects dynamic element stores, so each
        # slot update is a (BR, 128) select against an iota mask — ~2 VPU
        # ops per slot, fine for the sparse interface footprint
        b = pl.program_id(0)
        lo = starts_ref[b]
        hi = starts_ref[b + 1]
        base = b * BR * 128
        row_io = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 0)
        lane_io = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 1)

        def body(i, acc):
            p = pos_ref[i] - base
            row = p // 128
            lane = p - row * 128
            v = val_ref[i]
            hit = (row_io == row) & (lane_io == lane)
            return jnp.where(hit, v, acc)

        out_ref[...] = jax.lax.fori_loop(lo, hi, body, x_ref[...])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # vals
            pl.BlockSpec((BR, 128), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, 128), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, 128), x_flat.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(plan.starts, plan.pos, vals_sorted, x2)
    return out.reshape(-1)[:N]
