"""Profiling / tracing hooks — the framework's observability layer.

The reference's tracing is ad hoc: a gettimeofday µs timer
(baseline_mm.cu:14-20), perf_counter spans in tests, and a PRINT-gated
inspector occupancy report (sparse_mm.cu:139-161, 303-328). TPU-native
equivalents:

  - `trace(logdir)`: jax.profiler capture around a code block (view with
    tensorboard/xprof); `annotate(name)` adds named TraceMe spans so the
    SpMM stages are identifiable in the timeline.
  - `kernel_report(plan, ...)`: the inspector stats + projected roofline
    (Plan.report) — the analog of the reference's occupancy printout.
  - `measured_roofline(...)`: runs the kernel and reports achieved
    GFLOP/s, nnz/s, HBM GB/s against the projected speed-of-light,
    fulfilling BASELINE's per-kernel roofline-audit requirement.
"""

from __future__ import annotations

import contextlib
import json
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a profiler trace of the enclosed block into `logdir`."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def kernel_report(plan, n_cols: int = 256, dtype_bytes: int = 4) -> Dict[str, float]:
    """Inspector stats + projected roofline for a built plan."""
    return plan.report(n_cols, dtype_bytes)


def measured_roofline(
    plan,
    step: Optional[Callable] = None,
    x0=None,
    n_cols: int = 256,
    time_fn: Optional[Callable[[], float]] = None,
) -> Dict[str, float]:
    """Achieved vs projected throughput for an SpMM kernel.

    Either pass a shape-preserving chained step + initial carry (the
    utils.timing convention — e.g. ``lambda (bv, b): (bv, norm(spmm(bv,
    b)))``), or a `time_fn` returning measured seconds per iteration.
    """
    from tpusparse.utils.timing import device_time_per_iter

    if time_fn is not None:
        t = time_fn()
    elif step is not None:
        t = device_time_per_iter(step, x0)
    else:
        raise ValueError("pass either (step, x0) or time_fn")

    proj = plan.report(n_cols)
    flops = 2.0 * proj["nnz"] * n_cols
    t_sol = proj.get("projected_time_s", float("nan"))
    out = {
        "sec_per_iter": t,
        "achieved_gflops": flops / t / 1e9,
        "achieved_nnz_per_s": proj["nnz"] * n_cols / t,
        "projected_sol_sec": t_sol,
        "sol_fraction": t_sol / t,
    }
    out.update({f"plan_{k}": v for k, v in proj.items()})
    return out


def dump_report(path: str, report: Dict[str, float]) -> None:
    with open(path, "w") as f:
        json.dump(report, f, indent=2, default=float)
