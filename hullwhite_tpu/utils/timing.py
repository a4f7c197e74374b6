"""Wall-clock benchmarking utilities.

Replaces the reference's cudaEvent timing harness (benchmark_kernel,
benchmark_reductions.cu:17-72: 2 warmups + averaged timed runs).  Two
platform quirks force the protocol used here (measured, not assumed):

* on the axon TPU tunnel ``jax.block_until_ready`` does NOT actually block
  — only a host transfer synchronizes;
* the host<->device round trip costs ~30 ms, so each measurement loops the
  compiled function n times and fetches once, subtracting the separately
  measured fetch RTT.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def fetch_rtt(n: int = 10) -> float:
    """Measured host-fetch round-trip latency (seconds)."""

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8,))
    np.asarray(tiny(x))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(tiny(x))
    return (time.perf_counter() - t0) / n


def bench(fn, *args, n: int = 20, rtt: float | None = None, warmup: int = 1):
    """(seconds_per_call, last_result). Compiles on the first warmup call.

    Adaptive: ``n`` is a floor — the repetition count is grown (x4) until
    the measured span exceeds the fetch RTT by enough margin that RTT
    jitter (~ms) cannot swamp a sub-millisecond kernel.
    """
    if rtt is None:
        rtt = fetch_rtt()
    for _ in range(max(warmup, 1)):
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)

    while True:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        out = jax.tree_util.tree_map(np.asarray, out)
        elapsed = time.perf_counter() - t0
        if elapsed > rtt + max(5 * rtt, 0.05) or n >= 5000:
            break
        n *= 4
    dt = (elapsed - rtt) / n
    return max(dt, 1e-9), out
