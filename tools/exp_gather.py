#!/usr/bin/env python
"""Gather-strategy probe for the unstructured SpMV (round 5).

The take_along_axis ELL SpMV measures ~16 ns/element on the v5e (element-
serial; tools/bench_unstructured.py) — 300x off the grid path.  This tool
measures the building blocks every alternative rests on:

  g1  : element gather (S, n) indices into (S, n)        [ELL baseline]
  g8  : row gather of (8,)-slices from (nb, 8)           [8x8 BSR plan]
  g128: row gather of (128,)-slices from (nr, 128)       [window plan]
  band: dense-band multiply, 2B+1 static shifted fmas    [no gather at all]
  pgat: Pallas in-kernel lane take_along_axis probe      [Mosaic support?]

Usage: python tools/exp_gather.py [n_per_sub] [S] [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpddm_tpu.timing import fetch  # noqa: E402


def scan_time(fn, x, lengths=(6, 26), reps=3):
    import jax
    from jax import lax

    def chain(length):
        @jax.jit
        def run(v):
            out, _ = lax.scan(lambda c, _: (fn(c), None), v, None,
                              length=length)
            return out
        return run

    L1, L2 = lengths
    c1, c2 = chain(L1), chain(L2)
    y = c2(c1(x))
    fetch(y)
    w1 = w2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = c1(y)
        fetch(y)
        w1 = min(w1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        y = c2(y)
        fetch(y)
        w2 = min(w2, time.perf_counter() - t0)
    return max((w2 - w1) / (L2 - L1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    argv = [int(a) for a in sys.argv[1:4]]
    n = argv[0] if argv else 16384
    S = argv[1] if len(argv) > 1 else 16
    B = argv[2] if len(argv) > 2 else 128
    dtype = np.float32
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n={n} S={S} B={B}", flush=True)

    x = jnp.asarray(rng.normal(size=(S, n)).astype(dtype))
    idx = jnp.asarray(rng.integers(0, n, size=(S, n)).astype(np.int32))

    t = scan_time(lambda v: jnp.take_along_axis(v, idx, axis=1), x)
    print(f"g1   element gather  : {t*1e6:9.1f} us "
          f"({t/(S*n)*1e9:6.2f} ns/elt)", flush=True)

    nb = n // 8
    x8 = x[:, : nb * 8].reshape(S, nb, 8)
    idx8 = jnp.asarray(rng.integers(0, nb, size=(S, nb)).astype(np.int32))
    t = scan_time(
        lambda v: jnp.take_along_axis(v, idx8[:, :, None], axis=1), x8)
    print(f"g8   8-wide row gathr: {t*1e6:9.1f} us "
          f"({t/(S*nb)*1e9:6.2f} ns/row, {t/(S*n)*1e9:6.2f} ns/elt)",
          flush=True)

    nr = n // 128
    x128 = x[:, : nr * 128].reshape(S, nr, 128)
    idxr = jnp.asarray(rng.integers(0, nr, size=(S, nr)).astype(np.int32))
    t = scan_time(
        lambda v: jnp.take_along_axis(v, idxr[:, :, None], axis=1), x128)
    print(f"g128 128-wide row g. : {t*1e6:9.1f} us "
          f"({t/(S*nr)*1e9:6.2f} ns/row, {t/(S*n)*1e9:6.2f} ns/elt)",
          flush=True)

    # dense band multiply: y[i] = sum_o band[i, o] * x[i + o - B]
    band = jnp.asarray(rng.normal(size=(S, n, 1)).astype(dtype))

    def band_mult(v):
        xp = jnp.pad(v, ((0, 0), (B, B)))
        out = jnp.zeros_like(v)
        for o in range(0, 2 * B + 1, max(1, (2 * B) // 16)):
            out = out + band[:, :, 0] * xp[:, o: o + n]
        return out

    n_sh = len(range(0, 2 * B + 1, max(1, (2 * B) // 16)))
    t = scan_time(band_mult, x)
    per = t / n_sh
    full = per * (2 * B + 1)
    print(f"band {n_sh} shifts sample : {t*1e6:9.1f} us -> "
          f"{per*1e6:6.2f} us/shift, full 2B+1={2*B+1}: {full*1e6:9.1f} us",
          flush=True)

    # Pallas in-kernel lane gather probe
    if jax.default_backend() not in ("cpu",):
        try:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            def kern(x_ref, i_ref, o_ref):
                xv = x_ref[0]                      # (rows, 128)
                iv = i_ref[0]
                o_ref[0] = jnp.take_along_axis(xv, iv, axis=1)

            rows = n // 128
            xg = x[:, : rows * 128].reshape(S, rows, 128)
            ig = jnp.asarray(rng.integers(
                0, 128, size=(S, rows, 128)).astype(np.int32))

            def run(v):
                return pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((S, rows, 128), dtype),
                    grid=(S,),
                    in_specs=[
                        pl.BlockSpec((1, rows, 128), lambda s: (s, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, rows, 128), lambda s: (s, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, rows, 128), lambda s: (s, 0, 0),
                        memory_space=pltpu.VMEM))(v, ig)
            t = scan_time(run, xg)
            print(f"pgat pallas lane gather: {t*1e6:9.1f} us "
                  f"({t/(S*rows*128)*1e9:6.2f} ns/elt)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pgat pallas lane gather: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
