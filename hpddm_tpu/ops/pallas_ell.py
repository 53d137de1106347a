"""Windowed band-ELL SpMV: the TPU-native unstructured local product.

The reference's csrmv is sparsity-agnostic at full speed on CPUs
(include/HPDDM_wrapper.hpp:617-680) because CPUs have hardware gather; the
TPU does not, and XLA lowers the ELL ``take_along_axis`` SpMV to an
element-serial gather measured at ~10 ns/element on the v5e
(tools/exp_gather.py) — 300x off the grid path at equal nnz.

What the TPU *does* have is a fast in-register lane gather: Mosaic lowers
``jnp.take_along_axis(x (R,128), idx (R,128), axis=1)`` inside a Pallas
kernel at ~2.5 ps/element (tools/exp_pallas_gather.py — 4000x the XLA
path).  It only reaches 128 lanes, so this kernel makes every gather a
lane gather:

* local matrices are (reverse Cuthill-McKee) band-ordered: row r's columns
  lie within [r - B, r + B] (the model emits this ordering; annotation
  checks and refuses otherwise);
* rows are processed in blocks of ``BR``; a block's columns then lie in a
  static-size window of ``QT = BR/128 + 2*ceil(B/128) + 1`` consecutive
  128-tiles of x, resident in VMEM;
* storage is slot-major ELL: slot plane j holds (vals, window-local target)
  for the j-th nonzero of each row, in the standard (rows/128, 128) tile
  layout — so the per-slot gather output needs no unpacking and the
  reduction over slots is a plain sum of planes;
* per (slot, window-tile): one broadcast + one lane gather + one select.
  Work per block = w_pad * QT vreg-gathers; everything stays in VMEM.

The kernel computes the *local* SpMM only; it plugs into ``ops/spmv.spmm``
via the ``windowed`` annotation on ``BatchedELL``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpddm_tpu.core.formats import BatchedELL


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowedEll:
    """Slot-major banded ELL payload (see module doc).

    Negative results recorded here so they stay dead: (a) per-slot SMEM
    window starts (column-sorted rows have ~3-tile slot spreads vs the
    QT ~ 10-17 block window) measured NO faster at 262k (135.9 vs 125.5
    us — the per-slot dynamic window slices and SMEM scalar reads eat
    the saved selects) and overflow the 1 MB SMEM at 1M dofs; (b)
    @pl.when live-tile skipping with a VMEM scratch accumulator is 20x
    SLOWER (scalar branches + read-modify-write break Mosaic's
    pipelining).  The dense static-window loop below wins."""
    vals: jax.Array      # (S, nb, w_pad, BRT, 128)
    loc: jax.Array       # (S, nb, w_pad, BRT, 128) int32, window-local col
    w_pad: int = dataclasses.field(metadata=dict(static=True))
    BR: int = dataclasses.field(metadata=dict(static=True))
    QT: int = dataclasses.field(metadata=dict(static=True))
    QH: int = dataclasses.field(metadata=dict(static=True))
    n_tiles: int = dataclasses.field(metadata=dict(static=True))
    bandwidth: int = dataclasses.field(metadata=dict(static=True))


def annotate_windowed(A: BatchedELL, block_rows: int = 1024,
                      max_qt: int = 40) -> BatchedELL:
    """Attach the windowed payload to an ELL batch, or return it unchanged
    when the numbering is not banded enough (QT would exceed ``max_qt``).

    Bandwidth is measured from the stored structure (zero-valued slots are
    free to point anywhere, so they are retargeted to the row diagonal)."""
    S, n_max, w = A.values.shape
    vals = np.asarray(A.values)
    cols = np.asarray(A.cols).astype(np.int64)
    rows = np.arange(n_max, dtype=np.int64)[None, :, None]
    live = vals != 0.0
    cols_eff = np.where(live, cols, rows)
    B = int(np.abs(cols_eff - rows).max(initial=0))

    BR = int(block_rows)
    BRT = BR // 128
    QH = -(-B // 128)
    if BRT + 2 * QH + 1 > max_qt:
        return A
    nb = -(-n_max // BR)
    w_pad = w

    # column-sort each row so slot j's targets are ~monotone across a
    # block (minimal per-slot window spread)
    order = np.argsort(cols_eff, axis=2, kind="stable")
    cols_eff = np.take_along_axis(cols_eff, order, axis=2)
    vals = np.take_along_axis(vals, order, axis=2)

    n_pad = nb * BR
    vals_p = np.zeros((S, n_pad, w_pad), dtype=vals.dtype)
    vals_p[:, :n_max] = vals
    # padding rows: point at themselves (value 0, any in-window target ok)
    rows_p = np.arange(n_pad, dtype=np.int64)[None, :, None]
    cols_p = np.broadcast_to(np.minimum(rows_p, n_max - 1),
                             (S, n_pad, w_pad)).copy()
    cols_p[:, :n_max] = cols_eff

    # static per-block window: tiles [q0(b), q0(b) + QT) with q0 computed
    # identically here and in the kernel (a pure function of b)
    QT = BRT + 2 * QH + 1
    n_tiles = max(-(-n_max // 128), QT)
    b_of = np.arange(n_pad, dtype=np.int64) // BR
    q0 = np.clip(b_of * BRT - QH, 0, n_tiles - QT)     # (n_pad,)
    loc_p = cols_p - (q0 * 128)[None, :, None]
    if loc_p.min() < 0 or loc_p.max() >= QT * 128:
        raise AssertionError("windowed ELL: column outside its window "
                             f"(B={B}, QT={QT})")

    # slot-major tile layout: (S, nb, w_pad, BRT, 128)
    def to_slot_major(x):
        return np.ascontiguousarray(
            x.reshape(S, nb, BRT, 128, w_pad).transpose(0, 1, 4, 2, 3))

    payload = WindowedEll(
        vals=jnp.asarray(to_slot_major(vals_p)),
        loc=jnp.asarray(to_slot_major(loc_p).astype(np.int32)),
        w_pad=w_pad, BR=BR, QT=QT, QH=QH, n_tiles=int(n_tiles),
        bandwidth=B)
    return dataclasses.replace(A, windowed=payload)


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _windowed_spmv(vals: jax.Array, loc: jax.Array, x: jax.Array,
                   geom: Tuple[int, int, int, int, int],
                   interpret: bool = False) -> jax.Array:
    """x: (S, n) -> y: (S, n).  geom = (w_pad, BR, QT, QH, n_tiles)."""
    w_pad, BR, QT, QH, n_tiles = geom
    S, nb = vals.shape[:2]
    BRT = BR // 128
    n = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (0, n_tiles * 128 - n))) \
        .reshape(S, n_tiles, 128)

    def kernel(x_ref, v_ref, l_ref, o_ref):
        b = pl.program_id(1)
        q0 = jnp.clip(b * BRT - QH, 0, n_tiles - QT)
        xw = x_ref[0, pl.ds(q0, QT), :]                 # (QT, 128)
        acc = jnp.zeros((BRT, 128), dtype=o_ref.dtype)
        for j in range(w_pad):
            locj = l_ref[0, 0, j]                       # (BRT, 128)
            lane = jax.lax.rem(locj, jnp.int32(128))
            tile = jax.lax.div(locj, jnp.int32(128))
            g = jnp.zeros((BRT, 128), dtype=o_ref.dtype)
            for t in range(QT):
                src = jnp.broadcast_to(xw[t: t + 1, :], (BRT, 128))
                gt = jnp.take_along_axis(src, lane, axis=1)
                g = g + jnp.where(tile == t, gt, 0.0)
            acc = acc + v_ref[0, 0, j] * g
        o_ref[0, 0] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, nb, BRT, 128), x.dtype),
        grid=(S, nb),
        in_specs=[
            pl.BlockSpec((1, n_tiles, 128), lambda s, b: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w_pad, BRT, 128),
                         lambda s, b: (s, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w_pad, BRT, 128),
                         lambda s, b: (s, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BRT, 128), lambda s, b: (s, b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, vals, loc)
    return out.reshape(S, nb * BR)[:, :n]


def spmm_windowed(A: BatchedELL, x: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Dispatch entry: x (S, n, mu) -> (S, n, mu); one kernel pass per RHS
    (the values stream stays in VMEM across slots either way)."""
    we: WindowedEll = A.windowed
    geom = (we.w_pad, we.BR, we.QT, we.QH, we.n_tiles)
    mu = x.shape[-1]
    outs = [_windowed_spmv(we.vals, we.loc, x[:, :, m], geom,
                           interpret=interpret)
            for m in range(mu)]
    return jnp.stack(outs, axis=-1)
