"""Sparse iterative linear algebra on top of the framework's SpMM.

No reference analog (the reference stops at the matmul layer,
SURVEY.md §2.1) — this closes the loop for the standard consumers of a
sparse matrix library: solving A x = b and estimating spectra, with the
matrix-vector product riding the framework's plan-cached, cost-model-
routed `ops.spmm`. TPU-idiomatic: every solver is the matching
`jax.scipy.sparse.linalg` Krylov routine (jit-compatible
`lax.while_loop` internals) driven by our operator; nothing here
re-implements Krylov iterations in Python.

Operators may be CSR/BSR/COO or any (n,n)-shaped callable; solutions
are differentiable (jax.scipy solvers define implicit-function VJPs).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse import ops
from tpusparse.types import BSR, COO, CSR, bsr_to_csr, coo_to_csr

Operator = Union[CSR, BSR, COO, Callable]

_INT = np.int32


def speye(n: int, dtype=jnp.float32) -> CSR:
    """Sparse identity I_n as CSR."""
    idx = np.arange(n, dtype=_INT)
    return CSR(
        data=jnp.ones((n,), dtype),
        indices=idx,
        indptr=np.arange(n + 1, dtype=_INT),
        shape=(n, n),
    )


def _as_csr(a: Operator) -> CSR:
    if isinstance(a, BSR):
        return bsr_to_csr(a)
    if isinstance(a, COO):
        return coo_to_csr(a)
    return a


def as_matvec(
    a: Operator, method: str = "auto", transposable: bool = False
) -> Callable:
    """Matrix-vector/multivector product closure over a sparse operator.

    The returned fn maps (n,) -> (n,) or (n, k) -> (n, k) through
    `ops.spmm` (plan built once per pattern, cached by fingerprint).
    Callables pass through unchanged.

    ``transposable=True`` returns a plain-primitive gather/segment-sum
    formulation instead: `lax.custom_linear_solve` (inside the
    nonsymmetric Krylov solvers) must TRANSPOSE the operator, and
    `ops.spmm`'s custom_vjp has no transpose rule — gather + scatter-add
    primitives do. CG (symmetric) keeps the routed spmm.
    """
    if callable(a) and not isinstance(a, (CSR, BSR, COO)):
        return a
    a = _as_csr(a)
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"solvers need a square operator, got {a.shape}")
    if not transposable:
        return partial(ops.spmm, a, method=method)
    m = a.shape[0]
    rows = a.row_ids()
    idx = jnp.asarray(a.indices, jnp.int32)

    def mv(v):
        gathered = v[idx] if v.ndim == 1 else v[idx, :]
        prods = (a.data if v.ndim == 1 else a.data[:, None]) * gathered
        return jax.ops.segment_sum(
            prods, rows, num_segments=m, indices_are_sorted=True
        )

    return mv


def diagonal(a: Operator) -> jnp.ndarray:
    """Extract diag(A) as a dense (n,) vector (absent entries are 0).

    Pattern work is host-side (trace-time constant); values ride one
    scatter, so this is jittable in the values and differentiable.
    """
    a = _as_csr(a)
    n = min(a.shape)
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    rows = np.repeat(np.arange(a.shape[0], dtype=np.int64), np.diff(indptr))
    hit = rows == indices  # positions of stored diagonal entries
    pos = np.flatnonzero(hit)
    return (
        jnp.zeros((n,), a.dtype)
        .at[jnp.asarray(rows[pos].astype(_INT))]
        .set(a.data[jnp.asarray(pos.astype(_INT))])
    )


def jacobi_preconditioner(a: Operator, eps: float = 1e-12) -> Callable:
    """M⁻¹ ≈ diag(A)⁻¹ — the standard cheap preconditioner for cg/bicgstab.

    Zero/missing diagonal entries fall back to identity scaling.
    """
    d = diagonal(a)
    inv = jnp.where(jnp.abs(d) > eps, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)

    def apply(v):
        return v * inv if v.ndim == 1 else v * inv[:, None]

    return apply


def cg(
    a: Operator,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = 1e-5,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable] = None,
    method: str = "auto",
):
    """Conjugate gradient for SPD A. Returns (x, info) like jax.scipy."""
    return jax.scipy.sparse.linalg.cg(
        as_matvec(a, method), b, x0=x0, tol=tol, atol=atol, maxiter=maxiter, M=M
    )


def bicgstab(
    a: Operator,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = 1e-5,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable] = None,
    method: str = "auto",
):
    """BiCGSTAB for general (nonsymmetric) A."""
    return jax.scipy.sparse.linalg.bicgstab(
        as_matvec(a, method, transposable=True),
        b,
        x0=x0,
        tol=tol,
        atol=atol,
        maxiter=maxiter,
        M=M,
    )


def gmres(
    a: Operator,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = 1e-5,
    atol: float = 0.0,
    restart: int = 20,
    maxiter: Optional[int] = None,
    M: Optional[Callable] = None,
    solve_method: str = "batched",
    method: str = "auto",
):
    """GMRES(restart) for general A. solve_method='batched' avoids the
    incremental variant's per-iteration host sync — the right default on
    TPU where each sync is a ~25 ms tunnel round-trip."""
    return jax.scipy.sparse.linalg.gmres(
        as_matvec(a, method, transposable=True),
        b,
        x0=x0,
        tol=tol,
        atol=atol,
        restart=restart,
        maxiter=maxiter,
        M=M,
        solve_method=solve_method,
    )


def power_iteration(
    a: Operator,
    *,
    iters: int = 100,
    seed: int = 0,
    method: str = "auto",
):
    """Dominant eigenpair estimate via `lax.fori_loop` power iteration.

    Returns (eigenvalue, unit eigenvector). Sign convention: the Rayleigh
    quotient xᵀAx (correct for the dominant eigenvalue of symmetric A;
    for nonsymmetric A it estimates the dominant magnitude).
    """
    mv = as_matvec(a, method)
    n = (_as_csr(a).shape[0]) if isinstance(a, (CSR, BSR, COO)) else None
    if n is None:
        raise ValueError("power_iteration needs a sparse operator (for n)")
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n,))
    v0 = v0 / jnp.linalg.norm(v0)

    def body(_, v):
        w = mv(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v0)
    lam = jnp.vdot(v, mv(v))
    return lam, v


def lobpcg_topk(
    a: Operator,
    k: int = 4,
    *,
    iters: int = 100,
    tol: Optional[float] = None,
    oversample: int = 4,
    seed: int = 0,
    method: str = "auto",
):
    """Top-k eigenpairs of symmetric A via jax.experimental LOBPCG
    (blocked — the whole block advances through ONE SpMM per iteration,
    the MXU-friendly formulation). Returns (eigenvalues, eigenvectors,
    iterations_run).

    The internal block is k + ``oversample`` vectors: with a clustered
    spectrum an exact-size block can converge onto the wrong members of
    the cluster (measured on a random symmetric operator whose 2nd-5th
    eigenvalues sit within 0.4% — a k=2 block locked onto #1 and #4);
    the extra vectors absorb the cluster and the top k are returned.
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    csr = _as_csr(a)
    n = csr.shape[0]
    mv = as_matvec(csr, method)
    kb = min(k + max(oversample, 0), max(n // 2 - 1, k))
    x0 = jax.random.normal(jax.random.PRNGKey(seed), (n, kb), dtype=csr.dtype)
    # the internal Rayleigh-Ritz matmuls must run at fp32, not the TPU's
    # default bf16 passes (the SpMM matvec is already 3-pass fp32)
    with jax.default_matmul_precision("highest"):
        theta, u, it = lobpcg_standard(lambda X: mv(X), x0, m=iters, tol=tol)
    order = jnp.argsort(theta)[::-1][:k]
    return theta[order], u[:, order], it


def spsolve_lower_triangular(
    a: CSR, b: jnp.ndarray, *, unit_diagonal: bool = False
) -> jnp.ndarray:
    """Exact forward substitution for LOWER-triangular CSR A.

    Sequential by nature; expressed as a row-major `lax.scan` with the
    pattern padded host-side to ELL form (max row nnz wide) so each step
    is one fixed-size gather + dot — the TPU answer to an inherently
    serial solve. For large well-conditioned systems prefer the Krylov
    solvers above.
    """
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"triangular solve needs square A, got {a.shape}")
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    if (indices > rows).any():
        raise ValueError("matrix has entries above the diagonal")
    # split strict-lower entries from the diagonal, pad to ELL
    diag_mask = indices == rows
    if not unit_diagonal:
        diag_pos = np.full(n, -1, np.int64)
        diag_pos[rows[diag_mask]] = np.flatnonzero(diag_mask)
        if (diag_pos < 0).any():
            raise ValueError("missing diagonal entry (pass unit_diagonal=True?)")
        dvals = a.data[jnp.asarray(diag_pos.astype(_INT))]
    else:
        dvals = jnp.ones((n,), a.dtype)
    strict_idx = np.flatnonzero(~diag_mask)
    srows = rows[strict_idx]
    counts = np.bincount(srows, minlength=n)
    width = max(int(counts.max()) if srows.size else 0, 1)
    first = np.cumsum(counts) - counts
    slot = np.arange(srows.size, dtype=np.int64) - first[srows]
    ell_col = np.zeros((n, width), _INT)  # padded gathers read x[0]...
    ell_val_pos = np.full((n, width), -1, np.int64)
    ell_col[srows, slot] = indices[strict_idx]
    ell_val_pos[srows, slot] = strict_idx
    # ...and multiply by 0 via a padding mask on the values
    vpos = np.where(ell_val_pos < 0, 0, ell_val_pos)
    ell_vals = a.data[jnp.asarray(vpos.astype(_INT))] * jnp.asarray(
        ell_val_pos >= 0
    ).astype(a.dtype)

    # scan over rows, building x incrementally
    def body(x, inputs):
        i, cols, vals, bi, di = inputs
        acc = jnp.dot(vals, x[cols])
        xi = (bi - acc) / di
        return x.at[i].set(xi), None

    x0 = jnp.zeros((n,), jnp.promote_types(a.dtype, b.dtype))
    xs = (
        jnp.arange(n, dtype=jnp.int32),
        jnp.asarray(ell_col),
        ell_vals,
        b.astype(x0.dtype),
        dvals.astype(x0.dtype),
    )
    x, _ = jax.lax.scan(body, x0, xs)
    return x
