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
from tpusparse.types import (
    BSR,
    COO,
    CSR,
    DIA,
    bsr_to_csr,
    coo_to_csr,
    csr_to_dia,
    dia_to_csr,
)

Operator = Union[CSR, BSR, COO, DIA, Callable]

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
    if isinstance(a, DIA):
        return dia_to_csr(a)
    return a


def _maybe_dia(a: CSR, max_offsets: int = 128) -> Operator:
    """Upgrade a concrete banded CSR to DIA for matvec-heavy consumers.

    DIA SpMV streams at HBM rate while index formats pay XLA's scalar-
    gather floor (~15 ns/nnz — measured 1900x slower on 1M-row
    pentadiagonal SpMV). One-time eager conversion, so per-iteration
    cost inside Krylov loops is zero; guarded by a 256 MB storage cap.
    Returns `a` unchanged for unbanded/traced patterns or traced data."""
    from tpusparse.ops import _dia_pattern

    if not isinstance(a, CSR) or isinstance(a.data, jax.core.Tracer):
        return a
    pat = _dia_pattern(a, max_offsets)
    if pat is None:
        return a
    noff = int(pat[0].size)
    itemsize = jnp.dtype(a.dtype).itemsize
    if noff * a.shape[0] * itemsize > 256 * 1024 * 1024:
        return a
    return csr_to_dia(a, max_offsets=max_offsets)


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
    if callable(a) and not isinstance(a, (CSR, BSR, COO, DIA)):
        return a
    if isinstance(a, DIA):
        if a.shape[0] != a.shape[1]:
            raise ValueError(f"solvers need a square operator, got {a.shape}")
        return partial(ops.spmm, a, method="auto")
    a = _as_csr(a)
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"solvers need a square operator, got {a.shape}")
    if not transposable:
        if method == "auto":
            a = _maybe_dia(a)  # banded operators: gather-free matvec
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


def _reversed_pattern(a: CSR):
    """Host pattern work for the reversal trick: with J the index-reversal
    permutation, J·A·J of an UPPER-triangular A is lower-triangular.
    Returns (indptr, indices, perm) of J·A·J with sorted indices; values
    follow by the differentiable device gather a.data[perm]."""
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    n, m = a.shape
    counts = np.diff(indptr)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    new_rows = n - 1 - rows
    new_cols = m - 1 - indices.astype(np.int64)
    perm = np.lexsort((new_cols, new_rows))
    new_indptr = np.concatenate(
        [[0], np.cumsum(counts[::-1])]
    ).astype(_INT)
    return new_indptr, new_cols[perm].astype(_INT), perm


def spsolve_upper_triangular(
    a: CSR, b: jnp.ndarray, *, unit_diagonal: bool = False
) -> jnp.ndarray:
    """Exact backward substitution for UPPER-triangular CSR A.

    Expressed as the reversal-conjugated lower solve (one extra host
    pattern pass + a device value gather) so both directions share the
    single `lax.scan` substitution kernel."""
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"triangular solve needs square A, got {a.shape}")
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    rows = np.repeat(np.arange(a.shape[0], dtype=np.int64), np.diff(indptr))
    if (indices < rows).any():
        raise ValueError("matrix has entries below the diagonal")
    new_indptr, new_indices, perm = _reversed_pattern(a)
    a_rev = CSR(
        data=a.data[jnp.asarray(perm.astype(_INT))],
        indices=new_indices,
        indptr=new_indptr,
        shape=a.shape,
    )
    xr = spsolve_lower_triangular(
        a_rev, b[::-1], unit_diagonal=unit_diagonal
    )
    return xr[::-1]


def _ilu0_numpy(indptr, indices, v) -> int:
    """Pure-python fallback of the native ILU(0) value pass (same
    algorithm and return contract as csrc ts_ilu0)."""
    n = indptr.shape[0] - 1
    pos_of = np.full(n, -1, np.int64)
    epoch = np.full(n, -1, np.int64)
    diag = np.full(n, -1, np.int64)
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            pos_of[indices[p]] = p
            epoch[indices[p]] = i
        if epoch[i] != i:
            return -(i + 1)
        diag[i] = pos_of[i]
        for p in range(indptr[i], indptr[i + 1]):
            k = indices[p]
            if k >= i:
                break
            pivot = v[diag[k]]
            if pivot == 0.0:
                return -(k + 1)
            lik = v[p] / pivot
            v[p] = lik
            for q in range(diag[k] + 1, indptr[k + 1]):
                j = indices[q]
                if epoch[j] == i:
                    v[pos_of[j]] -= lik * v[q]
    return 0


def _ic0_numpy(indptr, indices, v) -> int:
    """Pure-python fallback of the native IC(0) value pass (ts_ic0)."""
    n = indptr.shape[0] - 1
    pos_of = np.full(n, -1, np.int64)
    epoch = np.full(n, -1, np.int64)
    diag = np.full(n, -1, np.int64)
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            pos_of[indices[p]] = p
            epoch[indices[p]] = i
        if epoch[i] != i:
            return -(i + 1)
        dsum = 0.0
        for p in range(indptr[i], indptr[i + 1]):
            j = indices[p]
            if j >= i:
                break
            s = 0.0
            for q in range(indptr[j], diag[j]):
                k = indices[q]
                if epoch[k] == i:
                    s += v[pos_of[k]] * v[q]
            lij = (v[p] - s) / v[diag[j]]
            v[p] = lij
            dsum += lij * lij
        diag[i] = pos_of[i]
        d = v[diag[i]] - dsum
        if d <= 0.0:
            return -(i + 1)
        v[diag[i]] = np.sqrt(d)
    return 0


def _factorize(kind: str, indptr, indices, v64) -> int:
    from tpusparse.runtime import native

    if native.available():
        return native.factorize_inplace(kind, indptr, indices, v64)
    return (_ilu0_numpy if kind == "ilu0" else _ic0_numpy)(indptr, indices, v64)


def _split_rows(indptr, indices, mask):
    """CSR pattern restricted to masked entries -> (indptr, positions)."""
    n = indptr.shape[0] - 1
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    keep = np.flatnonzero(mask)
    counts = np.bincount(rows[keep], minlength=n)
    sub_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(_INT)
    return sub_indptr, keep


def ilu0(a: Operator) -> tuple:
    """Zero-fill incomplete LU factorization, A ≈ L·U on A's pattern.

    Host-side setup (like plan building: requires concrete values; fp64
    value pass via the native runtime when available, csrc ts_ilu0).
    Needs sorted indices and a structurally present diagonal. Returns
    (L, U): L strict-lower CSR with an IMPLIED unit diagonal (solve with
    `unit_diagonal=True`), U upper CSR including the diagonal.
    """
    a = _as_csr(a)
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"ilu0 needs square A, got {a.shape}")
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    v = np.array(np.asarray(a.data), np.float64)
    status = _factorize("ilu0", indptr, indices, v)
    if status != 0:
        raise ValueError(
            f"ilu0 breakdown at row {-status - 1}: missing diagonal or "
            "zero pivot"
        )
    n = a.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    lower = indices < rows
    l_indptr, l_pos = _split_rows(indptr, indices, lower)
    u_indptr, u_pos = _split_rows(indptr, indices, ~lower)
    dt = a.dtype
    L = CSR(
        data=jnp.asarray(v[l_pos].astype(dt)),
        indices=indices[l_pos].astype(_INT),
        indptr=l_indptr,
        shape=a.shape,
    )
    U = CSR(
        data=jnp.asarray(v[u_pos].astype(dt)),
        indices=indices[u_pos].astype(_INT),
        indptr=u_indptr,
        shape=a.shape,
    )
    return L, U


def ic0(a: Operator) -> CSR:
    """Zero-fill incomplete Cholesky of an SPD matrix: L·Lᵀ ≈ A on
    tril(A)'s pattern. Host-side setup like `ilu0`; raises on a
    non-positive pivot (matrix not SPD enough for zero fill)."""
    a = _as_csr(a)
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"ic0 needs square A, got {a.shape}")
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    n = a.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    tril = indices <= rows
    l_indptr, l_pos = _split_rows(indptr, indices, tril)
    v = np.array(np.asarray(a.data), np.float64)[l_pos]
    status = _factorize("ic0", l_indptr, indices[l_pos], v)
    if status != 0:
        raise ValueError(
            f"ic0 breakdown at row {-status - 1}: missing diagonal or "
            "non-positive pivot (is A symmetric positive definite?)"
        )
    return CSR(
        data=jnp.asarray(v.astype(a.dtype)),
        indices=indices[l_pos].astype(_INT),
        indptr=l_indptr,
        shape=a.shape,
    )


def ilu_preconditioner(a: Operator) -> Callable:
    """M ≈ A⁻¹ from ILU(0): v ↦ U⁻¹ L⁻¹ v (two substitution scans).
    Pass as `M=` to cg/bicgstab/gmres."""
    L, U = ilu0(a)

    def apply(v):
        y = spsolve_lower_triangular(L, v, unit_diagonal=True)
        return spsolve_upper_triangular(U, y)

    return apply


def ic_preconditioner(a: Operator) -> Callable:
    """M ≈ A⁻¹ from IC(0): v ↦ L⁻ᵀ L⁻¹ v — the SPD-preserving
    preconditioner for `cg`."""
    L = ic0(a)
    Lt = ops.transpose_csr(L)

    def apply(v):
        y = spsolve_lower_triangular(L, v)
        return spsolve_upper_triangular(Lt, y)

    return apply


def bandwidth(a: Operator) -> int:
    """Matrix bandwidth max|i - j| over stored entries (host pattern
    statistic; 0 for diagonal/empty)."""
    a = _as_csr(a)
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    if indices.size == 0:
        return 0
    rows = np.repeat(np.arange(a.shape[0], dtype=np.int64), np.diff(indptr))
    return int(np.abs(rows - indices.astype(np.int64)).max())


def rcm_permutation(a: Operator, symmetric_mode: bool = False) -> np.ndarray:
    """Reverse Cuthill–McKee bandwidth-reducing ordering (host, scipy).

    Returns `perm` with the scipy convention: `permute_csr(a, perm, perm)`
    (= dense[perm][:, perm]) clusters entries toward the diagonal —
    plan-time preprocessing that concentrates nonzero BLOCKS for the
    tiled executors and reduces fill-sensitivity of ilu0/ic0.
    """
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    a = _as_csr(a)
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"rcm needs square A, got {a.shape}")
    return np.asarray(
        reverse_cuthill_mckee(a.to_scipy(), symmetric_mode=symmetric_mode),
        dtype=np.int64,
    )


def eigsh_lanczos(
    a: Operator,
    k: int = 6,
    *,
    which: str = "LA",
    iters: Optional[int] = None,
    seed: int = 0,
    method: str = "auto",
):
    """Top/bottom-k eigenpairs of symmetric A by the Lanczos process.

    The classic Krylov eigensolver (scipy.sparse.linalg.eigsh's ARPACK
    surface) built on the framework's SpMM matvec: m Lanczos steps with
    FULL reorthogonalization (two classical Gram-Schmidt passes per step
    — fp32 Lanczos loses orthogonality within ~20 steps without it),
    then a dense eigendecomposition of the small tridiagonal and Ritz
    vectors V·S. One matvec per step (vector Krylov; see `lobpcg_topk`
    for the blocked MXU-friendly alternative that advances k vectors per
    SpMM). which: 'LA' (largest algebraic), 'SA' (smallest), 'LM'
    (largest magnitude). Returns (eigenvalues (k,), eigenvectors (n,k)).

    Degenerate eigenvalues: a single-vector Krylov space contains ONE
    vector per eigenvalue — repeated copies only emerge via round-off
    and need extra iterations (e.g. 2-D Poisson's λ₂=λ₃ pair appears at
    ~2× the default m). For clustered/multiple spectra prefer
    `lobpcg_topk`, whose block sees all copies at once.
    """
    csr = _as_csr(a)
    n = csr.shape[0]
    if csr.shape[0] != csr.shape[1]:
        raise ValueError(f"eigsh needs square A, got {csr.shape}")
    if which not in ("LA", "SA", "LM"):
        raise ValueError(f"unknown which {which!r} (LA/SA/LM)")
    m = min(n, iters if iters is not None else max(2 * k + 8, 24))
    if k > m:
        raise ValueError(f"k={k} needs at least k Lanczos steps, got m={m}")
    mv = as_matvec(csr, method)
    dt = csr.dtype
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype=dt)
    v0 = v0 / jnp.linalg.norm(v0)

    def step(carry, _):
        V, alphas, betas, j = carry
        v = V[j]
        w = mv(v)
        alpha = jnp.vdot(v, w)
        w = w - alpha * v
        # full reorth, two CGS passes (rows > j are zero: subtracting
        # their projections is a no-op, so no masking needed)
        for _ in range(2):
            w = w - V.T @ (V @ w)
        beta = jnp.linalg.norm(w)
        # on breakdown (invariant subspace), continue with a zero vector;
        # the tridiagonal decouples and eigh still returns valid Ritz pairs
        safe = jnp.where(beta > 1e-7, beta, 1.0)
        vnext = jnp.where(beta > 1e-7, w / safe, jnp.zeros_like(w))
        V = V.at[j + 1].set(vnext)
        alphas = alphas.at[j].set(alpha)
        betas = betas.at[j].set(jnp.where(beta > 1e-7, beta, 0.0))
        return (V, alphas, betas, j + 1), None

    V0 = jnp.zeros((m + 1, n), dt).at[0].set(v0)
    with jax.default_matmul_precision("highest"):
        (V, alphas, betas, _), _ = jax.lax.scan(
            step,
            (V0, jnp.zeros((m,), dt), jnp.zeros((m,), dt), 0),
            None,
            length=m,
        )
        # Lanczos breakdown (Krylov space exhausted at step j): rows past
        # the first zero beta carry alpha=0 and zero basis vectors — a
        # decoupled zero block in T whose spurious 0 Ritz values would
        # win the LA/SA selection (and normalize to NaN vectors). Push
        # the invalid diagonal to a which-appropriate sentinel so valid
        # Ritz pairs always rank first.
        nzb = betas[: m - 1] > 0
        j_valid = jnp.where(
            jnp.all(nzb), m, jnp.argmin(nzb.astype(jnp.int32)) + 1
        )
        invalid = jnp.arange(m) >= j_valid
        big = jnp.asarray(1e30, dt)
        sentinel = {"LA": -big, "SA": big, "LM": 0.0}[which]
        T = (
            jnp.diag(jnp.where(invalid, sentinel, alphas))
            + jnp.diag(betas[: m - 1], 1)
            + jnp.diag(betas[: m - 1], -1)
        )
        theta, s = jnp.linalg.eigh(T)  # ascending
        if which == "LA":
            order = jnp.arange(m - 1, m - 1 - k, -1)
        elif which == "SA":
            order = jnp.arange(k)
        else:  # LM
            order = jnp.argsort(jnp.abs(theta))[::-1][:k]
        u = V[:m].T @ s[:, order]
        u = u / jnp.maximum(
            jnp.linalg.norm(u, axis=0, keepdims=True), 1e-30
        )
        # requesting more pairs than the Krylov space holds (invariant
        # subspace hit before k steps) yields NaN in the surplus slots —
        # an unmissable "no such eigenpair" signal, not a sentinel value
        surplus = jnp.arange(k) >= j_valid
        theta_out = jnp.where(surplus, jnp.nan, theta[order])
        u = jnp.where(surplus[None, :], jnp.nan, u)
    return theta_out, u


def tridiagonal_solve(a: Operator, b: jnp.ndarray) -> jnp.ndarray:
    """Exact direct solve A x = b for TRIDIAGONAL A (offsets ⊆ {-1,0,1}).

    Rides XLA's native Thomas-algorithm kernel
    (`jax.lax.linalg.tridiagonal_solve`) with the diagonals pulled
    straight from the DIA layout — the O(n) direct solver the iterative
    stack can't beat on this bandwidth. Accepts DIA/CSR/... operands;
    b may be (n,) or (n, k). Jittable and differentiable.
    """
    if isinstance(a, DIA):
        d = a
    else:
        csr = _as_csr(a)
        if csr.shape[0] != csr.shape[1]:
            raise ValueError(f"tridiagonal solve needs square A, got {csr.shape}")
        d = csr_to_dia(csr, max_offsets=3)
    if not set(d.offsets.tolist()) <= {-1, 0, 1}:
        raise ValueError(
            f"matrix is not tridiagonal (offsets {d.offsets.tolist()}); "
            "use cg/gmres or spsolve_*_triangular"
        )
    n = d.shape[0]
    if d.shape[0] != d.shape[1]:
        raise ValueError(f"tridiagonal solve needs square A, got {d.shape}")

    def _diag(off):
        hit = np.flatnonzero(d.offsets == off)
        if hit.size == 0:
            return jnp.zeros((n,), d.dtype)
        return d.data[int(hit[0])]

    # lax convention: dl[0] == 0 (sub), du[-1] == 0 (super) — the DIA
    # layout already stores structural zeros exactly there
    dl, dd, du = _diag(-1), _diag(0), _diag(1)
    rhs = b if b.ndim == 2 else b[:, None]
    x = jax.lax.linalg.tridiagonal_solve(dl, dd, du, rhs)
    return x if b.ndim == 2 else x[:, 0]


def block_jacobi_preconditioner(
    a: Operator, block_size: int = 32, eps: float = 1e-12
) -> Callable:
    """M⁻¹ ≈ blockdiag(A)⁻¹ with dense `block_size`-sized blocks.

    The TPU-friendly middle ground between point Jacobi and IC/ILU: the
    diagonal blocks are extracted once on host, LU-factored as ONE
    batched (nb, bs, bs) decomposition, and each apply is a batched
    triangular solve — all MXU/batched-dense work, no sequential scans
    or gathers. Zero/missing diagonals fall back to identity via the
    factorization of the (regularized) block.
    """
    a = _as_csr(a)
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"block jacobi needs square A, got {a.shape}")
    bs = int(block_size)
    nb = -(-n // bs)
    n_pad = nb * bs
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    inblock = rows // bs == indices // bs
    pos = np.flatnonzero(inblock)
    blocks_host = np.zeros((nb, bs, bs), np.float64)
    br = rows[pos]
    bc = indices[pos].astype(np.int64)
    # one host pull of the values (setup-time, like ilu0/plan building)
    vals = np.asarray(a.data, np.float64)[pos]
    blocks_host[br // bs, br % bs, bc % bs] = vals
    # regularize empty diagonal slots so LU never sees a singular block
    diag_idx = np.arange(bs)
    zero_diag = blocks_host[:, diag_idx, diag_idx] == 0.0
    blocks_host[:, diag_idx, diag_idx] = np.where(
        zero_diag, 1.0, blocks_host[:, diag_idx, diag_idx]
    )
    dt = a.dtype
    lu, piv = jax.scipy.linalg.lu_factor(jnp.asarray(blocks_host.astype(dt)))

    def apply(v):
        vv = v if v.ndim == 2 else v[:, None]
        vp = jnp.pad(vv, ((0, n_pad - n), (0, 0))).reshape(nb, bs, -1)
        out = jax.scipy.linalg.lu_solve((lu, piv), vp)
        out = out.reshape(n_pad, -1)[:n]
        return out if v.ndim == 2 else out[:, 0]

    return apply


def expm_multiply(
    a: Operator,
    v: jnp.ndarray,
    t: float = 1.0,
    *,
    krylov_dim: int = 30,
    method: str = "auto",
) -> jnp.ndarray:
    """exp(t·A) @ v for SYMMETRIC A via the Lanczos approximation.

    The action of the matrix exponential without ever forming it
    (scipy.sparse.linalg.expm_multiply's use case — heat-kernel graph
    diffusion, time propagation): build an m-dimensional Krylov basis
    with the SpMM matvec (full reorthogonalization, same recurrence as
    `eigsh_lanczos`), then  exp(tA)·v ≈ ‖v‖ · V · exp(t·T) · e₁  with
    the (m, m) tridiagonal exponential computed densely via its
    eigendecomposition. Error decays superexponentially in m for
    ‖tA‖ ≲ m (raise `krylov_dim` for large ‖t·A‖).
    """
    csr = _as_csr(a)
    if csr.shape[0] != csr.shape[1]:
        raise ValueError(f"expm_multiply needs square A, got {csr.shape}")
    n = csr.shape[0]
    m = min(int(krylov_dim), n)
    mv = as_matvec(csr, method)
    dt = jnp.promote_types(csr.dtype, v.dtype)
    nrm = jnp.linalg.norm(v)
    v0 = (v / jnp.maximum(nrm, 1e-30)).astype(dt)

    def step(carry, _):
        V, alphas, betas, j = carry
        w = mv(V[j])
        alpha = jnp.vdot(V[j], w)
        w = w - alpha * V[j]
        for _ in range(2):
            w = w - V.T @ (V @ w)
        beta = jnp.linalg.norm(w)
        safe = jnp.where(beta > 1e-7, beta, 1.0)
        V = V.at[j + 1].set(
            jnp.where(beta > 1e-7, w / safe, jnp.zeros_like(w))
        )
        return (
            V,
            alphas.at[j].set(alpha),
            betas.at[j].set(jnp.where(beta > 1e-7, beta, 0.0)),
            j + 1,
        ), None

    V0 = jnp.zeros((m + 1, n), dt).at[0].set(v0)
    with jax.default_matmul_precision("highest"):
        (V, alphas, betas, _), _ = jax.lax.scan(
            step,
            (V0, jnp.zeros((m,), dt), jnp.zeros((m,), dt), 0),
            None,
            length=m,
        )
        T = (
            jnp.diag(alphas)
            + jnp.diag(betas[: m - 1], 1)
            + jnp.diag(betas[: m - 1], -1)
        )
        evals, evecs = jnp.linalg.eigh(T)
        exp_t_e1 = evecs @ (jnp.exp(t * evals) * evecs[0, :])
        return (nrm * (V[:m].T @ exp_t_e1)).astype(v.dtype)


def svds(
    a: Operator,
    k: int = 6,
    *,
    iters: Optional[int] = None,
    seed: int = 0,
    method: str = "auto",
):
    """Top-k singular triplets of (rectangular) sparse A by
    Golub–Kahan–Lanczos bidiagonalization.

    scipy.sparse.linalg.svds' surface on the framework's SpMM: s
    bidiagonalization steps build orthonormal bases U (left) and V
    (right) with FULL reorthogonalization on both (two classical
    Gram-Schmidt passes per side — the fp32 analog of eigsh_lanczos'
    reorth), one A·v and one Aᵀ·u per step through plan-cached
    `ops.spmm` (the Aᵀ pattern comes from the fingerprint-cached
    `ops.transpose_csr`, so repeated calls on one matrix share both
    plans). The small (s, s) upper-bidiagonal B is SVD'd densely and
    Ritz triplets lifted: A ≈ (U·P) Σ (V·Q)ᵀ.

    Returns (u (m, k), s (k,), vt (k, n)) with singular values in
    DESCENDING order (note scipy returns ascending). If the Krylov
    space exhausts before k triplets exist (rank(A) < k), the surplus
    slots are NaN — the same unmissable "no such pair" signal as
    `eigsh_lanczos`.
    """
    csr = _as_csr(a)
    if not isinstance(csr, CSR):
        raise TypeError("svds needs a sparse operand (CSR/BSR/COO/DIA)")
    m_rows, n_cols = csr.shape
    s_steps = min(
        min(m_rows, n_cols), iters if iters is not None else max(2 * k + 8, 24)
    )
    if k > s_steps:
        raise ValueError(f"k={k} needs at least k GKL steps, got {s_steps}")
    mv = partial(ops.spmm, csr, method=method)
    csr_t = ops.transpose_csr(csr)
    mvt = partial(ops.spmm, csr_t, method=method)
    dt = csr.dtype
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n_cols,), dtype=dt)
    v0 = v0 / jnp.linalg.norm(v0)

    def step(carry, _):
        U, V, alphas, betas, j = carry
        # u_j: project A v_j off ALL previous left vectors (the beta_{j-1}
        # u_{j-1} recurrence term is subsumed by full reorth)
        u = mv(V[j])
        for _ in range(2):
            u = u - U.T @ (U @ u)
        alpha = jnp.linalg.norm(u)
        ok_a = alpha > 1e-7
        u = jnp.where(ok_a, u / jnp.where(ok_a, alpha, 1.0), jnp.zeros_like(u))
        U = U.at[j].set(u)
        # v_{j+1}: project A^T u_j off all previous right vectors
        w = mvt(u)
        for _ in range(2):
            w = w - V.T @ (V @ w)
        beta = jnp.linalg.norm(w)
        ok_b = beta > 1e-7
        w = jnp.where(ok_b, w / jnp.where(ok_b, beta, 1.0), jnp.zeros_like(w))
        V = V.at[j + 1].set(w)
        alphas = alphas.at[j].set(jnp.where(ok_a, alpha, 0.0))
        betas = betas.at[j].set(jnp.where(ok_b, beta, 0.0))
        return (U, V, alphas, betas, j + 1), None

    U0 = jnp.zeros((s_steps, m_rows), dt)
    V0 = jnp.zeros((s_steps + 1, n_cols), dt).at[0].set(v0)
    with jax.default_matmul_precision("highest"):
        (U, V, alphas, betas, _), _ = jax.lax.scan(
            step,
            (U0, V0, jnp.zeros((s_steps,), dt), jnp.zeros((s_steps,), dt), 0),
            None,
            length=s_steps,
        )
        # breakdown: steps past the first zero alpha carry zero basis rows
        # and a zero B block, whose sigma=0 Ritz values sort LAST in the
        # descending SVD — only surplus slots (>= #valid) need masking
        nza = alphas > 0
        j_valid = jnp.where(
            jnp.all(nza), s_steps, jnp.argmin(nza.astype(jnp.int32))
        )
        B = jnp.diag(alphas) + jnp.diag(betas[: s_steps - 1], 1)
        P, sigma, QT = jnp.linalg.svd(B)  # descending
        u_out = U.T @ P[:, :k]
        v_out = V[:s_steps].T @ QT[:k, :].T
        u_out = u_out / jnp.maximum(
            jnp.linalg.norm(u_out, axis=0, keepdims=True), 1e-30
        )
        v_out = v_out / jnp.maximum(
            jnp.linalg.norm(v_out, axis=0, keepdims=True), 1e-30
        )
        surplus = jnp.arange(k) >= j_valid
        sigma_out = jnp.where(surplus, jnp.nan, sigma[:k])
        u_out = jnp.where(surplus[None, :], jnp.nan, u_out)
        v_out = jnp.where(surplus[None, :], jnp.nan, v_out)
    return u_out, sigma_out, v_out.T


def lsqr(
    a: Operator,
    b: jnp.ndarray,
    *,
    damp: float = 0.0,
    iters: int = 50,
    method: str = "auto",
) -> jnp.ndarray:
    """Least-squares solve min ‖A x − b‖² (+ damp²‖x‖²) by LSQR.

    Paige–Saunders LSQR (scipy.sparse.linalg.lsqr's algorithm): GKL
    bidiagonalization of (A, b) with QR-by-Givens applied on the fly —
    mathematically CG on the normal equations but numerically far
    better conditioned. Rectangular A welcome; one A·v plus one Aᵀ·u
    per iteration through plan-cached `ops.spmm` (transpose pattern
    fingerprint-cached). Fixed `iters` in a `lax.scan` so the solve is
    one compiled loop — jit-compatible, no host sync per step.

    ``damp`` adds Tikhonov regularization exactly as scipy's lsqr.
    Returns x (n,).
    """
    csr = _as_csr(a)
    if not isinstance(csr, CSR):
        raise TypeError("lsqr needs a sparse operand (CSR/BSR/COO/DIA)")
    m_rows, n_cols = csr.shape
    if b.shape != (m_rows,):
        raise ValueError(f"b must be ({m_rows},), got {b.shape}")
    mv = partial(ops.spmm, csr, method=method)
    csr_t = ops.transpose_csr(csr)
    mvt = partial(ops.spmm, csr_t, method=method)
    dt = jnp.promote_types(csr.dtype, b.dtype)
    damp = jnp.asarray(damp, dt)
    eps = jnp.asarray(1e-30, dt)

    beta1 = jnp.linalg.norm(b)
    u = b.astype(dt) / jnp.maximum(beta1, eps)
    av = mvt(u)
    alpha1 = jnp.linalg.norm(av)
    v = av / jnp.maximum(alpha1, eps)

    def step(carry, _):
        x, w, u, v, alpha, beta, phibar, rhobar = carry
        # continue the bidiagonalization
        uu = mv(v) - alpha * u
        beta = jnp.linalg.norm(uu)
        u = uu / jnp.maximum(beta, eps)
        vv = mvt(u) - beta * v
        alpha = jnp.linalg.norm(vv)
        v = vv / jnp.maximum(alpha, eps)
        # eliminate the damping parameter (scipy lsqr's psi rotation)
        rhobar1 = jnp.sqrt(rhobar**2 + damp**2)
        cs1 = rhobar / jnp.maximum(rhobar1, eps)
        phibar = cs1 * phibar
        # plane rotation to zero the subdiagonal of the bidiagonal
        rho = jnp.sqrt(rhobar1**2 + beta**2)
        cs = rhobar1 / jnp.maximum(rho, eps)
        sn = beta / jnp.maximum(rho, eps)
        theta = sn * alpha
        rhobar = -cs * alpha
        phi = cs * phibar
        phibar = sn * phibar
        x = x + (phi / jnp.maximum(rho, eps)) * w
        w = v - (theta / jnp.maximum(rho, eps)) * w
        return (x, w, u, v, alpha, beta, phibar, rhobar), None

    x0 = jnp.zeros((n_cols,), dt)
    with jax.default_matmul_precision("highest"):
        (x, *_), _ = jax.lax.scan(
            step,
            (x0, v, u, v, alpha1, jnp.asarray(0.0, dt), beta1, alpha1),
            None,
            length=int(iters),
        )
    return x.astype(b.dtype)


def minres(
    a: Operator,
    b: jnp.ndarray,
    *,
    M: Optional[Callable] = None,
    iters: int = 100,
    method: str = "auto",
) -> jnp.ndarray:
    """Solve A x = b for SYMMETRIC (possibly indefinite) A by MINRES.

    The solver jax.scipy.sparse.linalg is missing: CG requires positive
    definiteness, GMRES pays O(restart·n) basis storage — MINRES handles
    indefinite symmetric systems (saddle points, shifted Laplacians,
    interior eigenproblems) with a 3-term Lanczos recurrence and two
    Givens rotations per step. One SpMM matvec per iteration; optional
    preconditioner ``M`` (must be symmetric positive definite, applied
    as a callable v ↦ M⁻¹v — `jacobi_preconditioner`/`ic_preconditioner`
    fit). Fixed `iters` in `lax.scan`; jit-compatible.
    """
    mv = as_matvec(a, method)
    if not callable(a) or isinstance(a, (CSR, BSR, COO, DIA)):
        csr = _as_csr(a)
        if csr.shape[0] != csr.shape[1]:
            raise ValueError(f"minres needs square A, got {csr.shape}")
    Minv = M if M is not None else (lambda x: x)
    dt = b.dtype
    eps = jnp.asarray(1e-30, dt)

    r1 = b
    y = Minv(b)
    beta1 = jnp.sqrt(jnp.maximum(jnp.vdot(r1, y), 0.0))

    def step(carry, _):
        (x, r1, r2, y, oldb, beta, dbar, epsln, phibar, cs, sn, w, w2) = carry
        v = y / jnp.maximum(beta, eps)
        yy = mv(v)
        # standard 3-term Lanczos with the previous vector removed
        # (scalar where: beta/oldb would be inf at the first step where
        # oldb == 0 — select the factor, not the vector, so inf never
        # multiplies the zero vector into NaN)
        factor = jnp.where(oldb > 0, beta / jnp.maximum(oldb, eps), 0.0)
        yy = yy - factor * r1
        alfa = jnp.vdot(v, yy)
        yy = yy - (alfa / jnp.maximum(beta, eps)) * r2
        r1n, r2n = r2, yy
        yn = Minv(yy)
        oldbn = beta
        betan = jnp.sqrt(jnp.maximum(jnp.vdot(r2n, yn), 0.0))
        # apply previous rotation
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln_n = sn * betan
        dbar_n = -cs * betan
        # next rotation to annihilate betan
        gamma = jnp.maximum(jnp.sqrt(gbar**2 + betan**2), eps)
        cs_n = gbar / gamma
        sn_n = betan / gamma
        phi = cs_n * phibar
        phibar_n = sn_n * phibar
        w1 = w2
        w2n = w
        wn = (v - oldeps * w1 - delta * w2n) / gamma
        xn = x + phi * wn
        return (
            xn,
            r1n,
            r2n,
            yn,
            oldbn,
            betan,
            dbar_n,
            epsln_n,
            phibar_n,
            cs_n,
            sn_n,
            wn,
            w2n,
        ), None

    z = jnp.zeros_like(b)
    init = (
        z,  # x
        r1.astype(dt),
        r1.astype(dt),  # r2
        y.astype(dt),
        jnp.asarray(0.0, dt),  # oldb
        beta1.astype(dt),
        jnp.asarray(0.0, dt),  # dbar
        jnp.asarray(0.0, dt),  # epsln
        beta1.astype(dt),  # phibar
        jnp.asarray(-1.0, dt),  # cs
        jnp.asarray(0.0, dt),  # sn
        z,  # w
        z,  # w2
    )
    with jax.default_matmul_precision("highest"):
        (x, *_), _ = jax.lax.scan(step, init, None, length=int(iters))
    return x
