"""Pallas TPU kernel for batched DIA SpMV.

The jnp DIA path (ops/spmv.py) pads x and adds `ndiag` shifted slices; XLA
materializes the shifted windows as relayout copies, which measures ~8x off
the HBM roofline. This kernel streams row blocks through VMEM instead:

* grid (S, n/BN); the diagonal values are delivered blocked by BlockSpec,
* the x window for a block overlaps its neighbors by the maximum offset,
  which BlockSpec cannot express (blocks must tile), so x stays in ANY/HBM
  memory and the halo'd window [j*BN, j*BN + BN + 2w) of the pre-padded
  vector is DMA'd into VMEM scratch explicitly,
* the per-diagonal multiply-adds are static-offset slices of the scratch
  window — pure VPU, fully unrolled.

Single-RHS fast path (the Krylov hot loop); multi-RHS falls back to the
jnp formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpddm_tpu.core.formats import BatchedDIA


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("offsets", "block_n",
                                             "interpret"))
def _dia_spmv_1rhs(values: jax.Array, x: jax.Array, offsets: tuple,
                   block_n: int = 16384, interpret: bool = False):
    """values: (S, nd, n), x: (S, n) -> y: (S, n)."""
    S, nd, n = values.shape
    w = max((abs(o) for o in offsets), default=0)
    w_pad = _round_up(max(w, 1), 128)
    BN = min(block_n, _round_up(n, 512))
    n_pad = _round_up(n, BN)

    vals_p = jnp.pad(values, ((0, 0), (0, 0), (0, n_pad - n)))
    # pre-pad x with w_pad halo on both sides (+ tail up to n_pad)
    xp = jnp.pad(x, ((0, 0), (w_pad, w_pad + n_pad - n)))

    def kernel(vals_ref, x_hbm, out_ref, scratch, sem):
        s = pl.program_id(0)
        j = pl.program_id(1)
        start = j * BN
        cp = pltpu.make_async_copy(
            x_hbm.at[s, pl.ds(start, BN + 2 * w_pad)], scratch, sem)
        cp.start()
        cp.wait()
        acc = vals_ref[0, offsets.index(0) if 0 in offsets else 0, :] * 0.0
        for k, off in enumerate(offsets):
            acc = acc + vals_ref[0, k, :] * scratch[w_pad + off:
                                                    w_pad + off + BN]
        out_ref[0, :] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, n_pad), x.dtype),
        grid=(S, n_pad // BN),
        in_specs=[
            pl.BlockSpec((1, nd, BN), lambda s, j: (s, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, BN), lambda s, j: (s, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BN + 2 * w_pad,), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(vals_p, xp)
    return out[:, :n]


def spmm_dia_pallas(A: BatchedDIA, x: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Pallas path for (S, n, mu) inputs; mu must be 1."""
    assert x.shape[-1] == 1
    y = _dia_spmv_1rhs(A.values, x[:, :, 0], tuple(A.offsets),
                       interpret=interpret)
    return y[:, :, None]
