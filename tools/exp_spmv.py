#!/usr/bin/env python
"""A/B experiments for the 5-point DIA SpMM at 2048^2/16 on the chip.

Hypothesis: the flattened-row kernels are cross-lane-shuffle bound (every
diagonal pays pltpu.roll + select), not HBM bound. On the (H, W) canvas
the +-W diagonals become free row offsets, leaving only the +-1 lane
shifts. Variants:
  flat-xla      current ops/spmv.py jnp path
  flat-pallas   current row-blocked Pallas kernel
  canvas-xla    (S, H, W) canvas, jnp pad+slice
  canvas-pallas (S, Hp, Wp) rows-in-sublanes kernel: N/S = sublane roll of
                an aligned superblock load (Mosaic rejects unaligned
                second-minor vector loads), E/W = single lane roll

Timing is length-differenced (two scan lengths in single executable
calls) to cancel the axon tunnel's ~26 ms per-call overhead — see
PERF.md "Honest TPU timing" / tools/bench_lenscale.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpddm_tpu.timing import fetch as _fetch_sync  # noqa: E402  (axon: block_until_ready does not sync)


def scan_time_diff(fn, x, L1=10, L2=60, reps=3):
    """Length-differenced per-step time of fn inside a lax.scan chain."""
    import jax
    from jax import lax

    def chain(length):
        @jax.jit
        def run(v):
            out, _ = lax.scan(lambda c, _: (fn(c), None), v, None,
                              length=length)
            return out
        return run

    c1, c2 = chain(L1), chain(L2)
    y = c2(c1(x))
    _fetch_sync(y)
    w1 = w2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = c1(y)
        _fetch_sync(y)
        w1 = min(w1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        y = c2(y)
        _fetch_sync(y)
        w2 = min(w2, time.perf_counter() - t0)
    return max((w2 - w1) / (L2 - L1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from hpddm_tpu.models import diffusion2d
    from hpddm_tpu.options import Options
    from hpddm_tpu.ops.spmv import spmm_dia
    from hpddm_tpu.ops.pallas_spmv import spmm_dia_pallas
    from hpddm_tpu.precond.schwarz import Schwarz

    S, Nx, Ny = 16, 2048, 2048
    dtype = np.float32
    gen = diffusion2d.generate_uniform(S, Nx, Ny, overlap=1, dtype=dtype)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=Options())
    sch.set_grid_geometry(gen.boxes, Nx, Ny)
    state = sch.operator_state()
    A = state.A
    nnz = sum(m.nnz for m in gen.mats)
    (i0, i1, j0, j1) = gen.boxes[0]
    W, H = i1 - i0, j1 - j0
    n = A.values.shape[2]
    assert H * W == n, (H, W, n)
    print(f"offsets={A.offsets} H={H} W={W} n={n} nnz={nnz/1e6:.1f}M",
          flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, n, 1)).astype(dtype))

    offs = list(A.offsets)
    # map offsets to canvas moves
    moves = []
    for o in offs:
        if o == 0:
            moves.append((0, 0))
        elif o == 1:
            moves.append((0, 1))
        elif o == -1:
            moves.append((0, -1))
        elif o == W:
            moves.append((1, 0))
        elif o == -W:
            moves.append((-1, 0))
        else:
            raise ValueError(o)
    vals_canvas = jnp.asarray(np.asarray(A.values).reshape(S, len(offs), H, W))

    def canvas_xla(v):
        xc = v[:, :, 0].reshape(S, H, W)
        xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1)))
        out = jnp.zeros((S, H, W), dtype=v.dtype)
        for k, (di, dj) in enumerate(moves):
            out = out + vals_canvas[:, k] * \
                xp[:, 1 + di: 1 + di + H, 1 + dj: 1 + dj + W]
        return out.reshape(S, n, 1)

    # --- canvas pallas: rows-in-sublanes -------------------------------
    # Mosaic requires second-minor vector-load offsets to be provably
    # 8-aligned, so the kernel loads one aligned (BR + 16)-row superblock
    # per grid step and forms the three row shifts with sublane rolls +
    # aligned static slices instead of three unaligned loads.
    Wp = ((W + 127) // 128) * 128
    BR = 64  # canvas rows per block (multiple of 8)

    Hp = ((H + BR - 1) // BR) * BR
    # canvas layout: row 8 + j holds x row j (8-row top halo keeps every
    # superblock load aligned); bottom halo pads to a multiple of 8
    rows_pad = 8 + Hp + 8
    vals_p = jnp.asarray(np.pad(np.asarray(A.values).reshape(S, 5, H, W),
                                ((0, 0), (0, 0), (0, Hp - H),
                                 (0, Wp - W))))

    n_blocks = Hp // BR

    def kernel(x_ref, vals_ref, out_ref):
        b = pl.program_id(1)
        base = pl.multiple_of(b * BR, BR)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BR, Wp), 1)
        # aligned superblock: canvas rows [base, base + BR + 16) hold
        # x rows [base - 8, base + BR + 8)
        sup = x_ref[0, pl.ds(base, BR + 16), :]       # (BR+16, Wp)
        acc = jnp.zeros((BR, Wp), dtype=out_ref.dtype)
        for k, (di, dj) in enumerate(moves):
            # x rows base+di .. base+BR+di = sup rows 8+di .. 8+BR+di:
            # roll them up to the top, take the aligned leading BR rows
            rows = pltpu.roll(sup, -(8 + di), 0)[:BR]
            if dj == 0:
                shifted = rows
            elif dj == 1:
                r = pltpu.roll(rows, Wp - 1, 1)
                shifted = jnp.where(lane < W - 1, r, 0.0)
            else:
                r = pltpu.roll(rows, 1, 1)
                shifted = jnp.where((lane >= 1) & (lane < W), r, 0.0)
            acc = acc + vals_ref[0, k] * shifted
        out_ref[0] = acc

    def canvas_pallas(v):
        xc = v[:, :, 0].reshape(S, H, W)
        xp = jnp.zeros((S, rows_pad, Wp), dtype=v.dtype)
        xp = xp.at[:, 8: 8 + H, :W].set(xc)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, Hp, Wp), v.dtype),
            grid=(S, n_blocks),
            in_specs=[
                pl.BlockSpec((1, rows_pad, Wp), lambda s, b: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 5, BR, Wp), lambda s, b: (s, 0, b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BR, Wp), lambda s, b: (s, b, 0),
                                   memory_space=pltpu.VMEM),
        )(xp, vals_p)
        return out[:, :H, :W].reshape(S, n, 1)

    # correctness vs flat
    y_ref = np.asarray(spmm_dia(A, x))
    for name, fn in (("canvas-xla", canvas_xla),
                     ("canvas-pallas", canvas_pallas)):
        try:
            y = np.asarray(fn(x))
            err = np.abs(y - y_ref).max() / max(np.abs(y_ref).max(), 1e-30)
            print(f"{name}: max rel err {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:800]}",
                  flush=True)

    # timings (length-differenced)
    bench = [
        ("flat-xla", lambda v: spmm_dia(A, v)),
        ("flat-pallas", lambda v: spmm_dia_pallas(A, v)),
        ("canvas-xla", canvas_xla),
        ("canvas-pallas", canvas_pallas),
    ]
    for name, fn in bench:
        try:
            t = scan_time_diff(fn, x)
            print(f"{name:20s}: {t*1e6:9.1f} us  ({nnz/t/1e9:.1f} GNnz/s)",
                  flush=True)
        except Exception as e:
            print(f"{name:20s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
