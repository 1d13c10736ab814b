"""Device-time measurement that survives async dispatch tunnels.

The reference times kernels with host perf_counter around one call
(tests/cublas_kernel_test.py:11-23). On this TPU environment the runtime
is fully asynchronous (block_until_ready returns before execution
completes) and each host→device roundtrip carries ~25 ms of tunnel
latency, so single-call wall-clocking measures the tunnel, not the
kernel. Instead: chain the op K times inside one jit with a loop-carried
data dependency (so XLA cannot hoist it), force completion with a scalar
fetch, and difference two iteration counts to cancel the fixed overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _chained(step: Callable, iters: int):
    @jax.jit
    def run(x):
        x = jax.lax.fori_loop(0, iters, lambda i, v: step(v), x)
        # depend on EVERY leaf: anything unreferenced lets XLA dead-code
        # eliminate the parts of the loop that produced it
        return sum(
            leaf.reshape(-1)[0].astype(jnp.float32)
            for leaf in jax.tree_util.tree_leaves(x)
        )

    return run


def device_time_per_iter(
    step: Callable,
    x0,
    iters_lo: int = 4,
    iters_hi: int = 20,
    repeats: int = 3,
    min_delta: float = 8e-3,
    max_iters: int = 4096,
) -> float:
    """Seconds per iteration of `step` (a shape-preserving x -> x fn).

    Adaptive: if the (iters_hi - iters_lo) iteration delta is below
    `min_delta` seconds it drowns in host↔device roundtrip jitter (~ms on
    the tunnel), so iteration counts are scaled up until the delta is
    measurable — fast kernels are timed over thousands of chained calls.
    """

    def measure(iters):
        run = _chained(step, iters)
        float(run(x0))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    while True:
        t_lo = measure(iters_lo)
        t_hi = measure(iters_hi)
        delta = t_hi - t_lo
        if delta >= min_delta or iters_hi >= max_iters:
            return max(delta / (iters_hi - iters_lo), 1e-9)
        scale = 8 if delta <= 0 else min(
            8, max(2, int(min_delta / max(delta, 1e-9) + 1))
        )
        iters_lo *= scale
        iters_hi *= scale


def normalizing(step: Callable) -> Callable:
    """Wrap a step to keep magnitudes bounded across chained iterations."""

    def wrapped(x):
        y = step(x)
        return y / (1.0 + jnp.abs(y).max())

    return wrapped
