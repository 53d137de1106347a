#!/usr/bin/env python
"""Rate probe for Mosaic's in-kernel lane gather (round 5).

The unstructured SpMV plan (windowed band-ELL) stands on
``jnp.take_along_axis(xv (R,128), iv (R,128), axis=1)`` inside a Pallas
kernel running at vreg speed.  This measures it: a kernel that performs T
dependent gather(+add) sweeps over an (R, 128) block, length-differenced
over T to cancel everything but the gather chain.

Usage: python tools/exp_pallas_gather.py [R] [S]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpddm_tpu.timing import fetch  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    argv = [int(a) for a in sys.argv[1:3]]
    R = argv[0] if argv else 2048
    S = argv[1] if len(argv) > 1 else 16
    dtype = np.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, R, 128)).astype(dtype))
    iv = jnp.asarray(rng.integers(0, 128, size=(S, R, 128)).astype(np.int32))

    def make(T):
        def kern(x_ref, i_ref, o_ref):
            xv = x_ref[0]
            ii = i_ref[0]
            acc = xv
            for _ in range(T):
                acc = acc + jnp.take_along_axis(acc, ii, axis=1)
            o_ref[0] = acc

        def run(v):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((S, R, 128), dtype),
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((1, R, 128), lambda s: (s, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, R, 128), lambda s: (s, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, R, 128), lambda s: (s, 0, 0),
                                       memory_space=pltpu.VMEM))(v, iv)
        return jax.jit(run)

    T1, T2 = 4, 260
    r1, r2 = make(T1), make(T2)
    y = r2(r1(x))
    fetch(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y1 = r1(x)
        fetch(y1)
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        y2 = r2(x)
        fetch(y2)
        w2 = time.perf_counter() - t0
        best = min(best, (w2 - w1) / (T2 - T1))
    n_el = S * R * 128
    n_vreg = S * R / 8
    print(f"backend={jax.default_backend()} R={R} S={S}: "
          f"{best*1e6:.1f} us per gather sweep of {n_el/1e6:.2f}M elts "
          f"-> {best/n_el*1e12:.2f} ps/elt, "
          f"{best/n_vreg*1e9:.2f} ns/vreg(8x128)", flush=True)


if __name__ == "__main__":
    main()
