"""Fetch-synchronized timing (the ONLY valid device-timing protocol here).

Measured round 4 (CLAUDE.md): on the axon TPU backend
``jax.block_until_ready`` returns before execution completes — a 4096^2
matmul "finished" in 0.18 ms while the subsequent value fetch waited 3.7 s.
The only reliable completion barrier is a device->host *value read*.

Every timing bracket in ``bench.py`` and ``tools/`` must therefore end with
:func:`fetch` (which also serves as the start barrier of the next bracket:
all prior dispatched work on the stream is complete once a later result's
value has been read).  Length-differenced chains remain the protocol for
per-op costs (the tunnel adds 1-2 ms per dispatch, which cancels in the
difference); see PERF.md and tools/bench_lenscale.py.
"""

from __future__ import annotations

import time

import jax
import numpy as np

__all__ = ["fetch", "timed"]


def fetch(x):
    """Completion barrier: read one scalar from the first array leaf of
    ``x`` back to the host.  Returns that scalar (numpy) or None when
    ``x`` holds no non-empty array leaf."""
    for leaf in jax.tree_util.tree_leaves(x):
        size = getattr(leaf, "size", 0)
        if size and hasattr(leaf, "ravel"):
            return np.asarray(jax.device_get(leaf.ravel()[0]))
    return None


def timed(fn, *args, reps=3, warmup=1):
    """Best-of-``reps`` fetch-synced wall time of ``fn(*args)``.

    Returns ``(best_seconds, worst_seconds, last_result)``.  The bracket
    both starts and ends synchronized: each rep's trailing :func:`fetch`
    doubles as the next rep's start barrier."""
    y = None
    for _ in range(max(warmup, 1)):
        y = fn(*args)
        fetch(y)
    best, worst = float("inf"), 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        y = fn(*args)
        fetch(y)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        worst = max(worst, dt)
    return best, worst, y
