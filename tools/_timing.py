"""Shared device-timing helper for the bench tools.

The axon dispatch tunnel returns from ``block_until_ready`` before the remote
queue is empty, so timing must sync via a host readback; the readback latency
is itself measured on a 1-dispatch run and subtracted.
"""

from __future__ import annotations

import time

import jax


def timeit(f, *a, n: int = 30) -> float:
    """Average seconds per call of ``f(*a)``, tunnel-drain-corrected."""
    o = f(*a)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    _ = float(jax.tree.leaves(f(*a))[0].ravel()[0])
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(n):
        o = f(*a)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    tot = time.perf_counter() - t0
    return (tot - (rt - tot / n)) / n
