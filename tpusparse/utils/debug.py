"""Runtime validation and debug checking.

TPU-native analog of the reference's error-checking layer: status-code
guards (`checkCudaStatus`/`checkCublasStatus`/`cusparseSafeCall`,
Utilities.cuh:17-154) become (a) eager host-side structural validation of
sparse containers and (b) `jax.experimental.checkify` functional asserts
that run *inside* jitted code when debug checks are enabled; the
`check_equal` device comparator kernel (baseline_mm.cu:37-50) becomes
`compare_report`, which returns mismatch statistics instead of printing
from the device.

Enable globally with `set_config(debug_checks=True)`: ops.spmm validates
its sparse operand on every call (host-side, concrete patterns only).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def validate_csr(a) -> None:
    """Eager structural validation of a CSR container (host side).

    Raises ValueError on malformed structure. No-op for traced patterns
    (use `check_csr` inside jit instead).
    """
    try:
        indptr = np.asarray(a.indptr)
        indices = np.asarray(a.indices)
    except Exception:  # traced — cannot validate eagerly
        return
    m, k = a.shape
    if indptr.shape != (m + 1,):
        raise ValueError(f"indptr shape {indptr.shape} != (m+1,) = ({m + 1},)")
    if indptr[0] != 0:
        raise ValueError(f"indptr[0] = {indptr[0]}, expected 0")
    if int(indptr[-1]) != indices.shape[0]:
        raise ValueError(
            f"indptr[-1] = {indptr[-1]} != nnz = {indices.shape[0]}"
        )
    d = np.diff(indptr)
    if (d < 0).any():
        raise ValueError("indptr is not monotonically non-decreasing")
    if indices.size and (indices.min() < 0 or indices.max() >= k):
        raise ValueError(
            f"column indices out of range [0, {k}): "
            f"min {indices.min()}, max {indices.max()}"
        )


def check_csr(a) -> None:
    """checkify asserts for a (possibly traced) CSR — call inside jit,
    under `checkify.checkify` (see `checked`)."""
    m, k = a.shape
    indices = jnp.asarray(a.indices)
    indptr = jnp.asarray(a.indptr)
    checkify.check(
        jnp.all((indices >= 0) & (indices < k)),
        "CSR column indices out of range [0, {k})",
        k=jnp.int32(k),
    )
    checkify.check(
        jnp.all(jnp.diff(indptr) >= 0), "CSR indptr not monotone"
    )
    checkify.check(
        indptr[-1] == a.nnz, "CSR indptr[-1] != nnz"
    )
    checkify.check(
        jnp.all(jnp.isfinite(jnp.asarray(a.data))), "CSR data has non-finite values"
    )


def checked(fn: Callable) -> Callable:
    """Wrap a function so its checkify.check asserts raise on the host.

    `checked(f)(*args)` runs f with functional error tracking and throws
    the first failed check as a Python exception — the debug-mode analog
    of the reference's status-code guards.
    """

    def run(*args, **kwargs):
        err, out = checkify.checkify(fn)(*args, **kwargs)
        err.throw()
        return out

    return run


def compare_report(
    expected: Any, actual: Any, rtol: float = 1e-5, atol: float = 1e-8
) -> Dict[str, float]:
    """Mismatch statistics between two arrays (reference `check_equal`
    analog, plus the nonzero-count printout of its failing tests,
    e.g. cublas_kernel_test.py:27-33)."""
    e = np.asarray(expected, dtype=np.float64)
    a = np.asarray(actual, dtype=np.float64)
    if e.shape != a.shape:
        return {"shape_mismatch": 1.0, "expected_size": e.size, "actual_size": a.size}
    diff = np.abs(e - a)
    tol = atol + rtol * np.abs(e)
    mism = diff > tol
    scale = max(np.abs(e).max(initial=0.0), 1e-30)
    return {
        "shape_mismatch": 0.0,
        "n": float(e.size),
        "mismatches": float(mism.sum()),
        "max_abs_err": float(diff.max(initial=0.0)),
        "max_rel_err": float(diff.max(initial=0.0) / scale),
        "expected_nonzeros": float(np.count_nonzero(e)),
        "actual_nonzeros": float(np.count_nonzero(a)),
        "allclose": float(not mism.any()),
    }
