"""Wall-clock benchmarking utilities.

Replaces the reference's cudaEvent timing harness (benchmark_kernel,
benchmark_reductions.cu:17-72: 2 warmups + averaged timed runs).  Two
platform quirks force the protocol used here (measured, not assumed):

* on the axon TPU tunnel ``jax.block_until_ready`` does NOT actually block
  — only a host transfer synchronizes;
* the host<->device round trip costs ~30 ms, so each measurement loops the
  compiled function n times and fetches once, subtracting the separately
  measured fetch RTT.

Outlier defense (round-5): the tunnel occasionally stalls for ~100-200 ms.
A stall inside a single adaptive window inflates the reading 6-14x AND
helps the window cross the adaptive exit threshold, so one stall used to
silently corrupt the recorded number (round-4 BENCH record: Q3 6x low,
g2_zbc 14x low vs repeatable).  ``bench`` now measures k>=3 independent
windows and takes the MINIMUM — transient stalls can only ever inflate a
wall-clock reading, so min-of-k is the unbiased stall-rejecting estimator
(same rationale as the reference averaging 5 runs after 2 warmups, but
robust rather than merely smoothed).  The adaptive exit itself is also
re-validated on the minimum: if only a stall pushed the first window over
the threshold, the repetition count keeps growing instead of locking in a
too-short window.
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


def _window(fn, args, n):
    """One timed window: n un-synced calls + one host fetch."""
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    out = jax.tree_util.tree_map(np.asarray, out)
    return time.perf_counter() - t0, out


def bench(fn, *args, n: int = 20, rtt: float | None = None, warmup: int = 1,
          k: int = 3):
    """(seconds_per_call, last_result). Compiles on the first warmup call.

    Adaptive: ``n`` is a floor — the repetition count is grown (x4) until
    the measured span exceeds the fetch RTT by enough margin that RTT
    jitter (~ms) cannot swamp a sub-millisecond kernel.

    Robust: ``k`` independent windows are measured at the accepted
    repetition count and the minimum is used, so a transient tunnel stall
    (which can only inflate wall-clock time) in any k-1 of them cannot
    move the result.  The adaptive exit condition is re-checked on the
    minimum window — a stall alone cannot lock in an under-sized window.
    """
    if rtt is None:
        rtt = fetch_rtt()
    k = max(k, 1)
    for _ in range(max(warmup, 1)):
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)

    thresh = rtt + max(5 * rtt, 0.05)
    while True:
        elapsed, out = _window(fn, args, n)
        if elapsed > thresh or n >= 5000:
            best = elapsed
            for _ in range(k - 1):
                e, out = _window(fn, args, n)
                best = min(best, e)
            # accept only if the MINIMUM window is genuinely above the
            # threshold (or n is capped) — otherwise the first window's
            # crossing was stall noise and n must keep growing
            if best > thresh or n >= 5000:
                break
        n *= 4
    dt = (best - rtt) / n
    return max(dt, 1e-9), out
