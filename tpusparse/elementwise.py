"""Sparse elementwise algebra: add / subtract / Hadamard / scale / prune
and row/column reductions on CSR matrices.

Completes the sparse-array API around the matmul core — the reference
has no sparse elementwise ops at all (it round-trips through dense
torch tensors for anything but SpMM; SURVEY.md §2.1). Same architecture
as the rest of the framework: pattern work (union / intersection of two
patterns) runs once on the host as a trace-time constant, fingerprint-
cached; the values pass is pure jnp — gather + scatter-add — so autodiff
flows through without custom_vjp.

Pattern semantics are structural, like scipy: ``sp_add`` keeps the UNION
of the two patterns even where values cancel to 0.0, ``sp_hadamard``
keeps the INTERSECTION even where a product is 0.0 — so the result
pattern (and the compiled program) never depends on runtime values.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpusparse.plan import _fingerprint
from tpusparse.types import CSR

_INT = np.int32


def _host_pattern(a: CSR, opname: str):
    from tpusparse.types import DIA

    if isinstance(a, DIA):
        raise TypeError(
            f"{opname} takes CSR operands; convert with "
            "tpusparse.dia_to_csr(a) (interop.from_scipy returns DIA "
            "for scipy dia_matrix inputs)"
        )
    try:
        return np.asarray(a.indptr), np.asarray(a.indices)
    except Exception as e:  # traced pattern
        raise ValueError(
            f"{opname} needs concrete sparsity patterns (host pattern "
            "union/intersection); call it outside jit or close over the "
            "result"
        ) from e


def _flat(indptr: np.ndarray, indices: np.ndarray, shape) -> np.ndarray:
    m, n = shape
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    return rows * np.int64(n) + indices.astype(np.int64)


def _positions_of(flat: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Index in `flat` of each (unique) entry of `targets`."""
    order = np.argsort(flat, kind="stable")
    where = np.searchsorted(flat[order], targets)
    return order[where].astype(np.int64)


_UNION_CACHE: dict = {}
_INTERSECT_CACHE: dict = {}


def _pair_key(a: CSR, b: CSR, ai, bi):
    return (
        _fingerprint(a.shape, (1, 1), ai[0], ai[1]),
        _fingerprint(b.shape, (1, 1), bi[0], bi[1]),
    )


def _union_plan(a: CSR, b: CSR):
    ai = _host_pattern(a, "sp_add")
    bi = _host_pattern(b, "sp_add")
    key = _pair_key(a, b, ai, bi)
    hit = _UNION_CACHE.get(key)
    if hit is not None:
        return hit
    m, n = a.shape
    fa = _flat(*ai, a.shape)
    fb = _flat(*bi, b.shape)
    uniq = np.union1d(fa, fb)  # sorted == CSR order
    slot_a = np.searchsorted(uniq, fa).astype(_INT)
    slot_b = np.searchsorted(uniq, fb).astype(_INT)
    c_indices = (uniq % n).astype(_INT)
    c_indptr = np.zeros(m + 1, dtype=_INT)
    c_indptr[1:] = np.cumsum(
        np.bincount((uniq // n).astype(np.int64), minlength=m)
    ).astype(_INT)
    hit = (slot_a, slot_b, c_indices, c_indptr, int(uniq.size))
    _UNION_CACHE[key] = hit
    return hit


def _intersect_plan(a: CSR, b: CSR):
    ai = _host_pattern(a, "sp_hadamard")
    bi = _host_pattern(b, "sp_hadamard")
    key = _pair_key(a, b, ai, bi)
    hit = _INTERSECT_CACHE.get(key)
    if hit is not None:
        return hit
    m, n = a.shape
    fa = _flat(*ai, a.shape)
    fb = _flat(*bi, b.shape)
    common = np.intersect1d(fa, fb)  # sorted == CSR order
    pa = _positions_of(fa, common).astype(_INT)
    pb = _positions_of(fb, common).astype(_INT)
    c_indices = (common % n).astype(_INT)
    c_indptr = np.zeros(m + 1, dtype=_INT)
    c_indptr[1:] = np.cumsum(
        np.bincount((common // n).astype(np.int64), minlength=m)
    ).astype(_INT)
    hit = (pa, pb, c_indices, c_indptr)
    _INTERSECT_CACHE[key] = hit
    return hit


def _check_same_shape(a: CSR, b: CSR, opname: str):
    if a.shape != b.shape:
        raise ValueError(f"{opname}: shape mismatch {a.shape} vs {b.shape}")


def sp_add(a: CSR, b: CSR, alpha: float = 1.0, beta: float = 1.0) -> CSR:
    """alpha·A + beta·B on the union pattern (differentiable in both)."""
    _check_same_shape(a, b, "sp_add")
    slot_a, slot_b, c_indices, c_indptr, c_nnz = _union_plan(a, b)
    dtype = jnp.promote_types(a.dtype, b.dtype)
    data = (
        jnp.zeros((c_nnz,), dtype)
        .at[slot_a]
        .add(alpha * a.data.astype(dtype))
        .at[slot_b]
        .add(beta * b.data.astype(dtype))
    )
    # pattern arrays stay host numpy (see ops.transpose_csr note)
    return CSR(data=data, indices=c_indices, indptr=c_indptr, shape=a.shape)


def sp_sub(a: CSR, b: CSR) -> CSR:
    """A - B on the union pattern."""
    return sp_add(a, b, 1.0, -1.0)


def sp_hadamard(a: CSR, b: CSR) -> CSR:
    """Elementwise product A ∘ B on the intersection pattern."""
    _check_same_shape(a, b, "sp_hadamard")
    pa, pb, c_indices, c_indptr = _intersect_plan(a, b)
    data = a.data[pa] * b.data[pb]
    # pattern arrays stay host numpy (see ops.transpose_csr note)
    return CSR(data=data, indices=c_indices, indptr=c_indptr, shape=a.shape)


def sp_scale(a: CSR, s) -> CSR:
    """Scalar (or per-nnz array) scaling; pattern unchanged."""
    return CSR(a.data * s, a.indices, a.indptr, a.shape)


def sp_map(a: CSR, fn) -> CSR:
    """Apply an elementwise fn to stored values only (pattern unchanged).

    Note this is NOT f applied to the dense matrix unless f(0) == 0 —
    the standard sparse-map contract.
    """
    return CSR(fn(a.data), a.indices, a.indptr, a.shape)


def prune_csr(
    a: CSR,
    threshold: Optional[float] = None,
    density: Optional[float] = None,
) -> CSR:
    """Magnitude-prune stored values: keep |v| > threshold, or the top
    `density` fraction (same contract as patch.sparsify_dense_params).

    Host-side: the surviving nnz is value-dependent, so this is not
    jittable — it defines a NEW pattern (rebuild plans downstream).
    """
    if (threshold is None) == (density is None):
        raise ValueError("specify exactly one of threshold / density")
    data = np.asarray(a.data)
    if density is not None:
        keep_n = max(1, int(round(density * data.size)))
        thr = np.partition(np.abs(data), data.size - keep_n)[data.size - keep_n]
        mask = np.abs(data) >= thr
        # break ties at the threshold deterministically (first-come)
        if mask.sum() > keep_n:
            extra = np.flatnonzero(np.abs(data) == thr)
            drop = extra[keep_n - mask.sum() :] if keep_n < mask.sum() else []
            mask[drop] = False
    else:
        mask = np.abs(data) > threshold
    keep = np.flatnonzero(mask)
    indptr = np.asarray(a.indptr)
    rows = np.repeat(np.arange(a.shape[0], dtype=np.int64), np.diff(indptr))
    new_indptr = np.zeros(a.shape[0] + 1, dtype=_INT)
    new_indptr[1:] = np.cumsum(
        np.bincount(rows[keep], minlength=a.shape[0])
    ).astype(_INT)
    return CSR(
        data=a.data[keep],
        indices=np.asarray(a.indices)[keep].astype(_INT),
        indptr=new_indptr,
        shape=a.shape,
    )


# ---------------------------------------------------------------------------
# Structural composition: vstack / hstack / block_diag.
#
# block_diag is the "block-diagonal flattening" answer to batched sparse
# operands with DIFFERENT patterns per batch element (SURVEY.md §7.3): stack
# the batch into one big CSR and run ONE SpMM against the stacked dense
# operand — one plan, one kernel launch, instead of a Python loop over
# patterns (the reference loops and stacks, matmuls.py:289-293).
# ---------------------------------------------------------------------------


def _host_patterns(mats, opname):
    return [_host_pattern(m, opname) for m in mats]


def vstack(mats) -> CSR:
    """Stack CSRs vertically (same ncols): [[A1], [A2], ...]."""
    mats = list(mats)
    if not mats:
        raise ValueError("vstack needs at least one matrix")
    n = mats[0].shape[1]
    if any(m.shape[1] != n for m in mats):
        raise ValueError(
            f"vstack: column counts differ: {[m.shape for m in mats]}"
        )
    pats = _host_patterns(mats, "vstack")
    indptr_parts = [pats[0][0]]
    offset = pats[0][0][-1]
    for indptr, _ in pats[1:]:
        indptr_parts.append(indptr[1:].astype(np.int64) + offset)
        offset = offset + indptr[-1]
    return CSR(
        data=jnp.concatenate([m.data for m in mats]),
        indices=np.concatenate([idx for _, idx in pats]).astype(_INT),
        indptr=np.concatenate(indptr_parts).astype(_INT),
        shape=(sum(m.shape[0] for m in mats), n),
    )


def hstack(mats) -> CSR:
    """Stack CSRs horizontally (same nrows): [A1 | A2 | ...]."""
    mats = list(mats)
    if not mats:
        raise ValueError("hstack needs at least one matrix")
    m_rows = mats[0].shape[0]
    if any(m.shape[0] != m_rows for m in mats):
        raise ValueError(
            f"hstack: row counts differ: {[m.shape for m in mats]}"
        )
    pats = _host_patterns(mats, "hstack")
    # interleave per row (vectorized): stable-sort all entries by
    # (row, matrix index) — also yields the data gather permutation
    # (values stay traced; only the permutation is host-built)
    k = len(mats)
    col_off = np.cumsum([0] + [m.shape[1] for m in mats[:-1]])
    rows_all = np.concatenate(
        [
            np.repeat(
                np.arange(m_rows, dtype=np.int64), np.diff(p[0].astype(np.int64))
            )
            for p in pats
        ]
    )
    j_all = np.concatenate(
        [np.full(p[1].size, j, dtype=np.int64) for j, p in enumerate(pats)]
    )
    order = np.argsort(rows_all * k + j_all, kind="stable")
    cols_all = np.concatenate(
        [p[1].astype(np.int64) + off for p, off in zip(pats, col_off)]
    )
    c_indptr = np.zeros(m_rows + 1, dtype=_INT)
    c_indptr[1:] = np.cumsum(np.bincount(rows_all, minlength=m_rows)).astype(_INT)
    data = jnp.concatenate([m.data for m in mats])[order]
    return CSR(
        data=data,
        indices=cols_all[order].astype(_INT),
        indptr=c_indptr,
        shape=(m_rows, int(sum(m.shape[1] for m in mats))),
    )


def block_diag(mats) -> CSR:
    """Block-diagonal CSR: diag(A1, A2, ...) — one big matrix whose SpMM
    against a stacked dense operand computes every per-pattern product in
    a single plan/kernel (batched heterogeneous-pattern SpMM)."""
    mats = list(mats)
    if not mats:
        raise ValueError("block_diag needs at least one matrix")
    pats = _host_patterns(mats, "block_diag")
    indptr_parts = [pats[0][0]]
    row_off = pats[0][0][-1]
    for indptr, _ in pats[1:]:
        indptr_parts.append(indptr[1:].astype(np.int64) + row_off)
        row_off = row_off + indptr[-1]
    col_off = np.cumsum([0] + [m.shape[1] for m in mats[:-1]])
    indices = np.concatenate(
        [idx.astype(np.int64) + off for (_, idx), off in zip(pats, col_off)]
    )
    return CSR(
        data=jnp.concatenate([m.data for m in mats]),
        indices=indices.astype(_INT),
        indptr=np.concatenate(indptr_parts).astype(_INT),
        shape=(
            int(sum(m.shape[0] for m in mats)),
            int(sum(m.shape[1] for m in mats)),
        ),
    )


def row_reduce(a: CSR, reduce: str = "sum") -> jnp.ndarray:
    """Per-row reduction over stored values -> (m,). Modes: sum/mean/min/
    max/nnz. Empty rows give 0 (matching the framework's empty-row
    contract, types.spmm_reference)."""
    import jax

    rows = a.row_ids()
    m = a.shape[0]
    counts = jnp.bincount(rows, length=m)
    if reduce == "nnz":
        return counts
    if reduce == "sum":
        return jax.ops.segment_sum(a.data, rows, num_segments=m)
    if reduce == "mean":
        s = jax.ops.segment_sum(a.data, rows, num_segments=m)
        return s / jnp.maximum(counts, 1)
    if reduce in ("min", "max"):
        seg = jax.ops.segment_max if reduce == "max" else jax.ops.segment_min
        ext = seg(a.data, rows, num_segments=m)
        return jnp.where(counts > 0, ext, 0.0)
    raise ValueError(f"unknown reduce mode {reduce!r}")


def row_softmax(a: CSR, temperature: float = 1.0) -> CSR:
    """Numerically-stable softmax over each row's STORED values (same
    pattern out) — the sparse-attention normalization: treat absent
    entries as -inf, so each stored row sums to 1.

    Differentiable in `a.data`; empty rows stay empty (no NaN — their
    segment slots are never gathered). Sorted-segment hints ride CSR's
    row-major invariant.
    """
    import jax

    rows = a.row_ids()
    m = a.shape[0]
    e = a.data / temperature
    mx = jax.ops.segment_max(
        e, rows, num_segments=m, indices_are_sorted=True
    )
    p = jnp.exp(e - mx[rows])
    s = jax.ops.segment_sum(
        p, rows, num_segments=m, indices_are_sorted=True
    )
    return CSR(data=p / s[rows], indices=a.indices, indptr=a.indptr, shape=a.shape)


def col_reduce(a: CSR, reduce: str = "sum") -> jnp.ndarray:
    """Per-column reduction over stored values -> (n,)."""
    from tpusparse.ops import transpose_csr

    return row_reduce(transpose_csr(a), reduce)


def sp_norm(a: CSR, ord: str = "fro") -> jnp.ndarray:
    """Matrix norm over stored values: 'fro', 1 (max col abs-sum), 'inf'
    (max row abs-sum)."""
    if ord == "fro":
        return jnp.sqrt(jnp.sum(a.data.astype(jnp.float32) ** 2))
    absd = sp_map(a, jnp.abs)
    if ord in (1, "1"):
        return jnp.max(col_reduce(absd, "sum"))
    if ord in ("inf", np.inf):
        return jnp.max(row_reduce(absd, "sum"))
    raise ValueError(f"unsupported norm ord {ord!r}")


def permute_csr(a: CSR, row_perm=None, col_perm=None) -> CSR:
    """Symmetric-or-not permutation P·A·Qᵀ as a pattern pass.

    `row_perm[i]` is the OLD index of NEW row i (scipy's permutation
    convention: the result equals `dense[row_perm][:, col_perm]`). The
    pattern work is host-side (trace-time constant, like every plan);
    values ride one differentiable device gather, so the result works
    under jit/grad with traced data.
    """
    indptr, indices = _host_pattern(a, "permute_csr")
    m, n = a.shape
    counts = np.diff(indptr)
    if row_perm is None:
        row_perm = np.arange(m, dtype=np.int64)
    row_perm = np.asarray(row_perm, np.int64)
    if row_perm.shape != (m,) or np.bincount(row_perm, minlength=m).max() != 1:
        raise ValueError(f"row_perm must be a permutation of range({m})")
    new_counts = counts[row_perm]
    new_indptr = np.concatenate([[0], np.cumsum(new_counts)]).astype(np.int32)
    nnz = int(indptr[-1])
    # gather each new row's old entry positions without a python loop
    order = (
        np.repeat(indptr[row_perm].astype(np.int64), new_counts)
        + np.arange(nnz, dtype=np.int64)
        - np.repeat(new_indptr[:-1].astype(np.int64), new_counts)
    )
    new_cols = indices[order].astype(np.int64)
    if col_perm is not None:
        col_perm = np.asarray(col_perm, np.int64)
        if col_perm.shape != (n,) or np.bincount(col_perm, minlength=n).max() != 1:
            raise ValueError(f"col_perm must be a permutation of range({n})")
        inv = np.empty(n, np.int64)
        inv[col_perm] = np.arange(n, dtype=np.int64)
        new_cols = inv[new_cols]
    # restore sorted columns within each (new) row
    new_rows = np.repeat(np.arange(m, dtype=np.int64), new_counts)
    resort = np.lexsort((new_cols, new_rows))
    order = order[resort]
    return CSR(
        data=a.data[jnp.asarray(order.astype(np.int32))],
        indices=new_cols[resort].astype(np.int32),
        indptr=new_indptr,
        shape=a.shape,
    )


def sp_kron(a: CSR, b: CSR) -> CSR:
    """Kronecker product A ⊗ B as CSR (scipy.sparse.kron semantics).

    The pattern cross-product runs on the host (trace-time constant,
    like every structural pass); values ride one gather-multiply
    `a.data[ka] * b.data[kb]`, so the result is jittable and
    differentiable in both operands' values. The standard constructor
    for grid operators (2-D Poisson = I⊗T + T⊗I) feeding the solver and
    preconditioner stack.
    """
    a_indptr, a_indices = _host_pattern(a, "sp_kron")
    b_indptr, b_indices = _host_pattern(b, "sp_kron")
    ma, na = a.shape
    mb, nb = b.shape
    nnza = int(a_indptr[-1])
    nnzb = int(b_indptr[-1])
    if nnza * nnzb > 200_000_000:
        raise ValueError(
            f"sp_kron pattern would have {nnza * nnzb} entries; "
            "build the operator blockwise instead"
        )
    a_rows = np.repeat(np.arange(ma, dtype=np.int64), np.diff(a_indptr))
    b_rows = np.repeat(np.arange(mb, dtype=np.int64), np.diff(b_indptr))
    ka = np.repeat(np.arange(nnza, dtype=np.int64), nnzb)
    kb = np.tile(np.arange(nnzb, dtype=np.int64), nnza)
    rows = a_rows[ka] * mb + b_rows[kb]
    cols = a_indices[ka].astype(np.int64) * nb + b_indices[kb].astype(np.int64)
    order = np.lexsort((cols, rows))
    ka, kb, rows, cols = ka[order], kb[order], rows[order], cols[order]
    indptr = np.zeros(ma * mb + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=ma * mb), out=indptr[1:])
    return CSR(
        data=a.data[jnp.asarray(ka.astype(_INT))]
        * b.data[jnp.asarray(kb.astype(_INT))],
        indices=cols.astype(_INT),
        indptr=indptr.astype(_INT),
        shape=(ma * mb, na * nb),
    )


def _tri_select(a: CSR, keep_mask: np.ndarray, indptr: np.ndarray) -> CSR:
    pos = np.flatnonzero(keep_mask)
    m = a.shape[0]
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    counts = np.bincount(rows[pos], minlength=m)
    new_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(_INT)
    return CSR(
        data=a.data[jnp.asarray(pos.astype(_INT))],
        indices=np.asarray(a.indices)[pos].astype(_INT),
        indptr=new_indptr,
        shape=a.shape,
    )


def sp_tril(a: CSR, k: int = 0) -> CSR:
    """Lower triangle (entries with j - i <= k) as CSR, scipy.sparse.tril
    semantics. Host pattern mask + one differentiable value gather."""
    indptr, indices = _host_pattern(a, "sp_tril")
    rows = np.repeat(
        np.arange(a.shape[0], dtype=np.int64), np.diff(indptr)
    )
    return _tri_select(a, indices.astype(np.int64) - rows <= k, indptr)


def sp_triu(a: CSR, k: int = 0) -> CSR:
    """Upper triangle (entries with j - i >= k) as CSR, scipy.sparse.triu
    semantics."""
    indptr, indices = _host_pattern(a, "sp_triu")
    rows = np.repeat(
        np.arange(a.shape[0], dtype=np.int64), np.diff(indptr)
    )
    return _tri_select(a, indices.astype(np.int64) - rows >= k, indptr)
