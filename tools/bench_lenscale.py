#!/usr/bin/env python
"""Separate per-call (tunnel) overhead from true per-step device cost:
time the same scan chain at two lengths in single calls;
step = (wall(L2) - wall(L1)) / (L2 - L1)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpddm_tpu.timing import fetch as _fetch_sync  # noqa: E402  (axon: block_until_ready does not sync)


def timed(fn, x, length, reps=5):
    import jax
    from jax import lax

    @jax.jit
    def chain(v):
        out, _ = lax.scan(lambda c, _: (fn(c), None), v, None, length=length)
        return out

    y = chain(x)
    _fetch_sync(y)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        y = chain(y)
        _fetch_sync(y)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from hpddm_tpu.models import diffusion2d
    from hpddm_tpu.options import Options
    from hpddm_tpu.parallel.ops import scaled_exchange
    from hpddm_tpu.precond.schwarz import Schwarz, gmv

    argv = [int(a) for a in sys.argv[1:4]] or [16, 2048, 2048]
    S, Nx, Ny = argv
    dtype = np.float32
    gen = diffusion2d.generate_uniform(S, Nx, Ny, overlap=1, dtype=dtype)
    sch = Schwarz(gen.mats, gen.neighbors, gen.mappings, d=gen.d,
                  options=Options())
    sch.set_grid_geometry(gen.boxes, Nx, Ny)
    state = sch.operator_state()
    dec = state.dec
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(S, sch.n_max, 1)).astype(dtype))

    L1, L2 = 10, 110
    for name, fn in (("floor", lambda v: v + 1.0),
                     ("exchange", lambda v: scaled_exchange(dec, v)),
                     ("gmv", lambda v: gmv(state, v))):
        w1 = timed(fn, x, L1)
        w2 = timed(fn, x, L2)
        step = (w2 - w1) / (L2 - L1)
        call = w1 - L1 * step
        print(f"{name:9s}: step {step*1e6:9.1f} us   per-call overhead "
              f"{call*1e3:7.2f} ms   (wall L{L1}={w1*1e3:.2f} ms, "
              f"L{L2}={w2*1e3:.2f} ms)")

    # is the per-call overhead the closure constants? pass state as an arg
    import jax
    from jax import lax
    state_dev = jax.device_put(state)

    def timed_arg(length, reps=5):
        @jax.jit
        def chain(st, v):
            out, _ = lax.scan(lambda c, _: (gmv(st, c), None), v, None,
                              length=length)
            return out

        y = chain(state_dev, x)
        _fetch_sync(y)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            y = chain(state_dev, y)
            _fetch_sync(y)
            best = min(best, time.perf_counter() - t0)
        return best

    w1 = timed_arg(L1)
    w2 = timed_arg(L2)
    step = (w2 - w1) / (L2 - L1)
    call = w1 - L1 * step
    print(f"gmv(arg) : step {step*1e6:9.1f} us   per-call overhead "
          f"{call*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
