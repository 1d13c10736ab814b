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


_OVERHEAD_CACHE: dict = {}


def _dispatch_overhead() -> float:
    """Fixed per-call host↔device round-trip cost (measured once per
    process): a compiled scalar no-op fetched like the timed programs."""
    key = "overhead"
    if key not in _OVERHEAD_CACHE:
        trivial = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros(())
        float(trivial(x))  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(trivial(x))
            best = min(best, time.perf_counter() - t0)
        _OVERHEAD_CACHE[key] = best
    return _OVERHEAD_CACHE[key]


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

    One compiled program per measurement (each distinct iteration count
    recompiles the chained loop, and on the tunneled TPU a 16K-scale
    compile costs 30-60 s — more than the measurement): starts at
    max(iters_hi, iters_lo) chained iterations (starting LOW would add
    extra compile rounds, so iters_lo only raises the floor; it is not a
    low starting count), subtracts the globally-calibrated dispatch
    overhead, and scales the iteration count up until the net time
    clears `min_delta` of host-roundtrip jitter. Warns if the budget runs
    out before the measurement clears the jitter floor.
    """
    overhead = _dispatch_overhead()
    iters = max(iters_hi, iters_lo)
    while True:
        run = _chained(step, iters)
        float(run(x0))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        net = best - overhead
        if net >= min_delta or iters >= max_iters:
            if net < min_delta:
                import warnings

                warnings.warn(
                    f"device_time_per_iter: net time {net:.2e}s never "
                    f"cleared min_delta={min_delta:.0e} at iters={iters}; "
                    "the returned per-iter time is noise-dominated",
                    RuntimeWarning,
                    stacklevel=2,
                )
            return max(net / iters, 1e-9)
        scale = 8 if net <= 0 else min(
            8, max(2, int(min_delta / max(net, 1e-9) + 1))
        )
        iters *= scale


def normalizing(step: Callable) -> Callable:
    """Wrap a step to keep magnitudes bounded across chained iterations."""

    def wrapped(x):
        y = step(x)
        return y / (1.0 + jnp.abs(y).max())

    return wrapped
