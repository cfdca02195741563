"""Reliable device timing helpers.

jax.block_until_ready is a NO-OP through the axon remote-TPU tunnel used in
this environment (measured: a 1.1-TFLOP matmul "completes" in 0.08 ms by
block_until_ready; fetching one output element takes the real ~65 ms).
The only trustworthy completion barrier is a host fetch. These helpers
standardize that:

  sync(tree)        — fetch ONE element of one output buffer (XLA program
                      outputs materialize together, so any buffer ready =>
                      program finished); transfers 4 bytes, not the tensor.
  measure_rtt()     — round-trip latency of an empty fetch, for subtracting
                      dispatch+network latency from small-kernel timings.
  time_fn(fn, *a)   — best-of-n wall time of fn with sync barriers, RTT
                      subtracted.

On CPU/local backends sync() degrades to a cheap fetch and rtt ~ 0, so the
same code times correctly everywhere.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def sync(tree) -> None:
    """Completion barrier that actually waits (host-fetches 4 bytes)."""
    for x in jax.tree.leaves(tree):
        if hasattr(x, "dtype") and hasattr(x, "size") and x.size:
            np.asarray(jax.device_get(x.ravel()[0]))
            return
    # No array leaves: nothing to wait for.


def measure_rtt(n: int = 5) -> float:
    """Dispatch + fetch latency of a trivial program (seconds)."""
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def time_fn(fn, *args, n: int = 5, subtract_rtt: bool = True) -> float:
    """Best-of-n wall seconds for fn(*args), honest barrier, RTT-corrected.

    fn should be jitted by the caller (or cheap to re-trace).
    """
    out = fn(*args)
    sync(out)
    rtt = measure_rtt() if subtract_rtt else 0.0
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9)
