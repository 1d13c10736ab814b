"""Sparse array containers (COO / CSR / BSR) as registered JAX pytrees.

TPU-native replacement for the reference's sparse handling:
  - torch CSR property extraction (reference matmuls.py:178-187)
  - host COO->CSR counting sort   (reference src/sparse_mm.cu:110-134)
  - cuSPARSE dense<->CSR convert  (reference src/baseline_mm.cu:218-264)

Design notes (TPU-first, not a translation):
  * Containers are immutable pytrees: device arrays as children, static
    shape/blocksize metadata as aux data, so they pass through ``jit`` /
    ``vmap`` / ``shard_map`` without retracing on values.
  * nnz is static (the length of ``data``) — XLA needs static shapes, so
    sparsity *patterns* are trace-time constants and *values* are traced.
  * Index dtype is int32 throughout (TPU-native scalar width).
  * BSR is the performance format: the MXU wants dense (8,128)-multiple
    blocks, so the tiled kernel path densifies CSR into BSR blocks
    (see tpusparse/plan.py for the inspector).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Shape2 = Tuple[int, int]

_INDEX_DTYPE = jnp.int32


def _static_shape(shape) -> Shape2:
    shape = tuple(int(s) for s in shape)
    if len(shape) != 2:
        raise ValueError(f"sparse containers are 2-D, got shape {shape}")
    return shape


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class COO:
    """Coordinate-format sparse matrix.

    data: (nnz,) values; row/col: (nnz,) int32 coordinates; shape static.
    """

    data: jnp.ndarray
    row: jnp.ndarray
    col: jnp.ndarray
    shape: Shape2

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def density(self) -> float:
        return self.nnz / float(self.shape[0] * self.shape[1])

    def tree_flatten(self):
        return (self.data, self.row, self.col), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, row, col = children
        return cls(data=data, row=row, col=col, shape=aux[0])

    @classmethod
    def from_dense(cls, mat) -> "COO":
        """Host-side conversion (nnz is data-dependent, so not jittable)."""
        mat = np.asarray(mat)
        shape = _static_shape(mat.shape)
        row, col = np.nonzero(mat)
        order = np.lexsort((col, row))  # row-major order, like the reference
        row, col = row[order], col[order]
        return cls(
            data=jnp.asarray(mat[row, col]),
            row=jnp.asarray(row, dtype=_INDEX_DTYPE),
            col=jnp.asarray(col, dtype=_INDEX_DTYPE),
            shape=shape,
        )

    def to_dense(self) -> jnp.ndarray:
        out = jnp.zeros(self.shape, dtype=self.dtype)
        return out.at[self.row, self.col].add(self.data)

    def transpose(self) -> "COO":
        return COO(
            data=self.data,
            row=self.col,
            col=self.row,
            shape=(self.shape[1], self.shape[0]),
        )

    @property
    def T(self) -> "COO":
        return self.transpose()


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class CSR:
    """Compressed-sparse-row matrix.

    data: (nnz,) values; indices: (nnz,) int32 column ids;
    indptr: (nrows+1,) int32 row offsets; shape static.
    """

    data: jnp.ndarray
    indices: jnp.ndarray
    indptr: jnp.ndarray
    shape: Shape2

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def density(self) -> float:
        return self.nnz / float(self.shape[0] * self.shape[1])

    def tree_flatten(self):
        return (self.data, self.indices, self.indptr), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, indices, indptr = children
        return cls(data=data, indices=indices, indptr=indptr, shape=aux[0])

    @classmethod
    def from_dense(cls, mat) -> "CSR":
        """Host-side conversion (nnz is data-dependent, so not jittable)."""
        return coo_to_csr(COO.from_dense(mat))

    @classmethod
    def from_scipy(cls, sp) -> "CSR":
        sp = sp.tocsr()
        return cls(
            data=jnp.asarray(sp.data),
            indices=jnp.asarray(sp.indices, dtype=_INDEX_DTYPE),
            indptr=jnp.asarray(sp.indptr, dtype=_INDEX_DTYPE),
            shape=_static_shape(sp.shape),
        )

    def to_scipy(self):
        import scipy.sparse as ssp

        return ssp.csr_matrix(
            (
                np.asarray(self.data),
                np.asarray(self.indices),
                np.asarray(self.indptr),
            ),
            shape=self.shape,
        )

    def row_ids(self) -> jnp.ndarray:
        """Expand indptr to a per-nonzero row id vector (jittable)."""
        try:  # concrete indptr (the common case): expand on host once —
            # the jittable searchsorted costs ~40 ms at 500K nnz on TPU
            indptr = np.asarray(self.indptr)
            return jnp.asarray(
                np.repeat(
                    np.arange(self.shape[0], dtype=np.int32), np.diff(indptr)
                )
            )
        except Exception:  # traced indptr
            return _expand_indptr(self.indptr, self.nnz)

    def to_dense(self) -> jnp.ndarray:
        rows = self.row_ids()
        m, k = self.shape
        if m * k < 2**31 - 1:
            # flat scatter with sortedness hint where it actually holds:
            # within-row column order is NOT a CSR invariant here (e.g.
            # coo_to_csr of row-sorted-only COO keeps columns unsorted),
            # and a false indices_are_sorted promise makes the TPU sorted
            # scatter silently misplace updates. Verify on host when the
            # pattern is concrete; claim nothing when traced.
            sorted_hint = False
            try:
                idx_np = np.asarray(self.indices, dtype=np.int64)
                flat_np = (
                    np.repeat(
                        np.arange(m, dtype=np.int64),
                        np.diff(np.asarray(self.indptr)),
                    )
                    * k
                    + idx_np
                )
                sorted_hint = bool(np.all(np.diff(flat_np) >= 0))
            except Exception:  # traced pattern
                pass
            flat = rows.astype(jnp.int32) * np.int32(k) + jnp.asarray(
                self.indices
            ).astype(jnp.int32)
            out = (
                jnp.zeros((m * k,), dtype=self.dtype)
                .at[flat]
                .add(
                    self.data,
                    indices_are_sorted=sorted_hint,
                    unique_indices=False,
                )
            )
            return out.reshape(m, k)
        return jnp.zeros(self.shape, dtype=self.dtype).at[rows, self.indices].add(
            self.data
        )

    # -- operator sugar (thin wrappers over the public op surface) ---------
    # Lazy imports avoid the types->ops circular dependency; each operator
    # is the documented op, nothing more. __array_priority__ makes numpy
    # defer mixed expressions (np_array * csr) to our reflected methods
    # instead of object-broadcasting.

    __array_priority__ = 1000

    def __matmul__(self, other):
        from tpusparse import ops
        from tpusparse.spgemm import spgemm

        if isinstance(other, CSR):
            return spgemm(self, other)
        return ops.spmm(self, jnp.asarray(other))

    def __rmatmul__(self, x):
        from tpusparse import ops

        return ops.dsmm(jnp.asarray(x), self)

    def __add__(self, other):
        from tpusparse.elementwise import sp_add

        if not isinstance(other, CSR):
            return NotImplemented
        return sp_add(self, other)

    def __sub__(self, other):
        from tpusparse.elementwise import sp_sub

        if not isinstance(other, CSR):
            return NotImplemented
        return sp_sub(self, other)

    def _scale_or_raise(self, other):
        from tpusparse.elementwise import sp_scale

        if jnp.ndim(other) != 0:  # dense broadcasting would silently
            # densify; be explicit at the API boundary
            raise TypeError(
                "CSR * array is not supported (would densify); use "
                "sp_hadamard for sparse*sparse or scale by a scalar"
            )
        return sp_scale(self, other)

    def __mul__(self, other):
        from tpusparse.elementwise import sp_hadamard

        if isinstance(other, CSR):
            return sp_hadamard(self, other)
        return self._scale_or_raise(other)

    def __rmul__(self, other):
        return self._scale_or_raise(other)

    def __neg__(self):
        from tpusparse.elementwise import sp_scale

        return sp_scale(self, -1.0)

    def transpose(self) -> "CSR":
        """CSR transpose via stable sort on column ids (jittable: nnz static)."""
        rows = self.row_ids()
        order = jnp.argsort(self.indices, stable=True)
        new_indices = rows[order]
        new_data = self.data[order]
        counts = jnp.bincount(self.indices, length=self.shape[1])
        new_indptr = jnp.concatenate(
            [jnp.zeros((1,), _INDEX_DTYPE), jnp.cumsum(counts).astype(_INDEX_DTYPE)]
        )
        return CSR(
            data=new_data,
            indices=new_indices.astype(_INDEX_DTYPE),
            indptr=new_indptr,
            shape=(self.shape[1], self.shape[0]),
        )

    @property
    def T(self) -> "CSR":
        return self.transpose()


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class BSR:
    """Block-compressed-sparse-row matrix — the TPU performance format.

    data: (nblocks, bm, bk) dense blocks; indices: (nblocks,) int32 block-column
    ids; indptr: (nrow_blocks+1,) int32; shape static (logical, pre-padding);
    blocksize static (bm, bk). Rows/cols are conceptually zero-padded up to
    block multiples; ``to_dense`` strips the padding.
    """

    data: jnp.ndarray
    indices: jnp.ndarray
    indptr: jnp.ndarray
    shape: Shape2
    blocksize: Shape2

    @property
    def nblocks(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self) -> int:
        """Stored entries (counts zero fill inside blocks)."""
        bm, bk = self.blocksize
        return self.nblocks * bm * bk

    def tree_flatten(self):
        return (self.data, self.indices, self.indptr), (self.shape, self.blocksize)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, indices, indptr = children
        return cls(
            data=data, indices=indices, indptr=indptr, shape=aux[0], blocksize=aux[1]
        )

    def row_block_ids(self) -> jnp.ndarray:
        return _expand_indptr(self.indptr, self.nblocks)

    def to_dense(self) -> jnp.ndarray:
        bm, bk = self.blocksize
        nbr = self.indptr.shape[0] - 1
        nbc = _cdiv(self.shape[1], bk)
        padded = jnp.zeros((nbr, nbc, bm, bk), dtype=self.dtype)
        padded = padded.at[self.row_block_ids(), self.indices].add(self.data)
        full = padded.transpose(0, 2, 1, 3).reshape(nbr * bm, nbc * bk)
        return full[: self.shape[0], : self.shape[1]]

    @classmethod
    def from_dense(cls, mat, blocksize: Shape2) -> "BSR":
        """Host-side conversion keeping only blocks with any nonzero.

        Processes one row-block strip at a time — peak extra memory is
        O(bm·k + stored blocks), not a second full padded copy of the
        input (which at 1M rows doubled an already-large allocation)."""
        mat = np.asarray(mat)
        shape = _static_shape(mat.shape)
        bm, bk = blocksize
        nbr, nbc = _cdiv(shape[0], bm), _cdiv(shape[1], bk)
        kp = nbc * bk
        chunks, bcol_list, counts = [], [], np.zeros(nbr, dtype=np.int64)
        strip = np.zeros((bm, kp), dtype=mat.dtype)
        for i in range(nbr):
            r0 = i * bm
            rows = min(bm, shape[0] - r0)
            strip[:] = 0
            strip[:rows, : shape[1]] = mat[r0 : r0 + rows]
            blocks = strip.reshape(bm, nbc, bk).transpose(1, 0, 2)
            occupied = np.flatnonzero((blocks != 0).any(axis=(1, 2)))
            if occupied.size:
                chunks.append(blocks[occupied].copy())
                bcol_list.append(occupied)
                counts[i] = occupied.size
        indptr = np.zeros(nbr + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        data = (
            np.concatenate(chunks)
            if chunks
            else np.zeros((0, bm, bk), dtype=mat.dtype)
        )
        bcol = (
            np.concatenate(bcol_list) if bcol_list else np.zeros(0, np.int64)
        )
        return cls(
            data=jnp.asarray(data),
            indices=jnp.asarray(bcol, dtype=_INDEX_DTYPE),
            indptr=jnp.asarray(indptr, dtype=_INDEX_DTYPE),
            shape=shape,
            blocksize=(bm, bk),
        )


from tpusparse.utils.config import cdiv as _cdiv  # single impl


def _expand_indptr(indptr: jnp.ndarray, nnz: int) -> jnp.ndarray:
    """indptr (n+1,) -> per-entry row ids (nnz,). Jittable; nnz static."""
    return (
        jnp.searchsorted(indptr, jnp.arange(nnz, dtype=_INDEX_DTYPE), side="right")
        .astype(_INDEX_DTYPE)
        - 1
    )


# ----------------------------------------------------------------------------
# Format conversions (jittable where nnz is static)
# ----------------------------------------------------------------------------


def coo_to_csr(a: COO) -> "CSR":
    """COO -> CSR. Analog of the reference's host counting sort
    (src/sparse_mm.cu:110-134), generalized to unsorted input. Concrete
    patterns use the native C++ counting sort (csrc/inspector.cpp
    ts_coo_to_csr) when built; traced inputs fall back to the jittable
    XLA sort path."""
    try:
        rows_np = np.asarray(a.row)
        from tpusparse.runtime import native

        if native.available():
            indptr, order = native.coo_to_csr(rows_np, a.shape[0])
            return CSR(
                data=a.data[order],
                indices=np.asarray(a.col)[order].astype(np.int32),
                indptr=indptr,
                shape=a.shape,
            )
    except Exception:
        pass  # traced, or native unavailable — use the XLA path
    order = jnp.argsort(a.row, stable=True)
    counts = jnp.bincount(a.row, length=a.shape[0])
    indptr = jnp.concatenate(
        [jnp.zeros((1,), _INDEX_DTYPE), jnp.cumsum(counts).astype(_INDEX_DTYPE)]
    )
    return CSR(
        data=a.data[order],
        indices=a.col[order].astype(_INDEX_DTYPE),
        indptr=indptr,
        shape=a.shape,
    )


def csr_to_coo(a: CSR) -> COO:
    return COO(data=a.data, row=a.row_ids(), col=a.indices, shape=a.shape)


def csr_to_bsr(a: CSR, blocksize: Shape2) -> BSR:
    """Host-side CSR -> BSR via a direct pattern pass — O(nnz + stored
    blocks) memory, never the O(m·k) dense round-trip (a 1M-row matrix
    must convert in a few hundred MB). Pattern-dependent block count, so
    not jittable (like the reference's dense_to_csr analysis pass,
    baseline_mm.cu:218-264, this is a host-side one-time conversion)."""
    bm, bk = blocksize
    m, k = a.shape
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices).astype(np.int64)
    data = np.asarray(a.data)
    nbr, nbc = _cdiv(m, bm), _cdiv(k, bk)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    key = (rows // bm) * nbc + (indices // bk)
    ukeys, block_of = np.unique(key, return_inverse=True)
    bdata = np.zeros((ukeys.size, bm, bk), dtype=data.dtype)
    np.add.at(bdata, (block_of, rows % bm, indices % bk), data)
    ubrow = (ukeys // nbc).astype(np.int64)
    indptr_b = np.zeros(nbr + 1, dtype=np.int64)
    np.add.at(indptr_b[1:], ubrow, 1)
    return BSR(
        data=jnp.asarray(bdata),
        indices=jnp.asarray(ukeys % nbc, dtype=_INDEX_DTYPE),
        indptr=jnp.asarray(np.cumsum(indptr_b), dtype=_INDEX_DTYPE),
        shape=a.shape,
        blocksize=(bm, bk),
    )


def bsr_to_csr(a: BSR) -> CSR:
    """Host-side BSR -> CSR via a direct block pass (drops explicit
    zeros inside blocks) — O(nnz) memory, no dense round-trip."""
    bm, bk = a.blocksize
    m, k = a.shape
    bdata = np.asarray(a.data)
    bcols = np.asarray(a.indices).astype(np.int64)
    brows = np.asarray(a.row_block_ids()).astype(np.int64)
    nz_blk, nz_r, nz_c = np.nonzero(bdata)
    rows = brows[nz_blk] * bm + nz_r
    cols = bcols[nz_blk] * bk + nz_c
    vals = bdata[nz_blk, nz_r, nz_c]
    keep = (rows < m) & (cols < k)  # strip block zero-padding
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(indptr[1:], rows, 1)
    return CSR(
        data=jnp.asarray(vals),
        indices=jnp.asarray(cols, dtype=_INDEX_DTYPE),
        indptr=jnp.asarray(np.cumsum(indptr), dtype=_INDEX_DTYPE),
        shape=a.shape,
    )


# ----------------------------------------------------------------------------
# Random fixtures (tests + benchmarks)
# ----------------------------------------------------------------------------


def random_coo(key, shape: Shape2, density: float, dtype=jnp.float32) -> COO:
    """Uniformly random sparsity pattern with uniform(0,1) values.

    Mirrors the reference test fixtures (`gen_coords`/`sparsify`,
    tests/cusparse_kernel_test.py:13-30) but with exact nnz via choice
    without replacement, seeded by a JAX PRNG key.
    """
    m, n = _static_shape(shape)
    nnz = max(1, int(round(density * m * n)))
    kv, kc = jax.random.split(jax.random.PRNGKey(key) if isinstance(key, int) else key)
    # Host-side pattern sampling: patterns are trace-time constants anyway.
    seed = int(jax.random.randint(kc, (), 0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    flat = rng.choice(m * n, size=nnz, replace=False)
    flat.sort()
    row = (flat // n).astype(np.int32)
    col = (flat % n).astype(np.int32)
    data = jax.random.uniform(kv, (nnz,), dtype=dtype)
    return COO(
        data=data,
        row=jnp.asarray(row),
        col=jnp.asarray(col),
        shape=(m, n),
    )


def random_csr(key, shape: Shape2, density: float, dtype=jnp.float32) -> CSR:
    return coo_to_csr(random_coo(key, shape, density, dtype))


def random_powerlaw_csr(
    key, shape: Shape2, avg_nnz_per_row: float, alpha: float = 1.5,
    dtype=jnp.float32,
) -> CSR:
    """Skewed (SuiteSparse-like) pattern: Zipf-distributed row degrees.

    Real sparse matrices (graphs, FEM meshes) are not uniformly random —
    a few heavy rows dominate, which is exactly what breaks fixed-width
    ELL padding (SURVEY.md §7.3 "variable nnz per row"). Row i's degree
    ∝ (i+1)^(-alpha) shuffled, scaled to the requested mean, capped at
    n; column picks are uniform without replacement per row.
    """
    m, n = _static_shape(shape)
    seed = int(key) if isinstance(key, int) else int(
        jax.random.randint(key, (), 0, 2**31 - 1)
    )
    rng = np.random.default_rng(seed)
    raw = (np.arange(1, m + 1, dtype=np.float64)) ** (-alpha)
    rng.shuffle(raw)
    deg = np.maximum(1, np.round(raw * (avg_nnz_per_row * m / raw.sum()))).astype(
        np.int64
    )
    deg = np.minimum(deg, n)
    indptr = np.zeros(m + 1, dtype=np.int32)
    np.cumsum(deg, out=indptr[1:])
    indices = np.concatenate(
        [np.sort(rng.choice(n, size=int(d), replace=False)) for d in deg]
    ).astype(np.int32)
    data = jnp.asarray(
        rng.random(int(indptr[-1])).astype(np.dtype(dtype))
    )
    return CSR(data=data, indices=indices, indptr=indptr, shape=(m, n))


# ----------------------------------------------------------------------------
# Pure-jnp reference ops (the oracle everything else is tested against)
# ----------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("reduce", "return_arg"))
def spmm_reference(
    a: CSR, b: jnp.ndarray, reduce: str = "sum", return_arg: bool = False
) -> jnp.ndarray:
    """Gather/segment SpMM: C[i,:] = reduce_{j in row i} A[i,j] * B[j,:].

    XLA-path oracle for the Pallas kernels; supports every reference
    reduction mode (src/naive_reducer.cuh:23 ReductionType {SUM, MEAN,
    MUL, DIV, MIN, MAX}). `div` is a running division from 1 — i.e. the
    reciprocal of the product (Reducer::update, naive_reducer.cuh:78-79).
    With return_arg=True (min/max only), also returns the argmin/argmax:
    the global nnz index whose contribution attains the extremum, `nnz`
    for empty rows (the reference's arg_out contract,
    naive_sparse_mm.cu:125-129).
    """
    if b.ndim != 2:
        raise ValueError(f"spmm_reference expects 2-D b, got {b.shape}")
    rows = a.row_ids()
    gathered = b[a.indices] * a.data[:, None]
    m = a.shape[0]
    if return_arg and reduce not in ("min", "max"):
        raise ValueError("return_arg is only meaningful for min/max")
    if reduce == "sum":
        return jax.ops.segment_sum(gathered, rows, num_segments=m)
    if reduce == "mean":
        s = jax.ops.segment_sum(gathered, rows, num_segments=m)
        cnt = jax.ops.segment_sum(
            jnp.ones_like(a.data), rows, num_segments=m
        )
        return s / jnp.maximum(cnt, 1.0)[:, None]
    if reduce in ("max", "min"):
        seg = jax.ops.segment_max if reduce == "max" else jax.ops.segment_min
        ext = seg(gathered, rows, num_segments=m)
        counts0 = jnp.bincount(rows, length=m)
        if not return_arg:
            # empty rows get 0, matching the reference Reducer::write
            # count==0 contract (naive_reducer.cuh:94-99) and the
            # return_arg branch below — NOT the segment identity (±inf)
            return jnp.where((counts0 > 0)[:, None], ext, 0.0)
        nnz = a.nnz
        e_idx = jnp.arange(nnz, dtype=jnp.int32)[:, None]
        # first nnz index attaining the extremum per (row, col); empty
        # rows keep the reference's fill value `nnz` (int32: x64 is off)
        cand = jnp.where(gathered == ext[rows], e_idx, np.int32(nnz))
        arg = jax.ops.segment_min(
            jnp.broadcast_to(cand, gathered.shape), rows, num_segments=m
        )
        big = jnp.iinfo(jnp.int32).max
        arg = jnp.where(arg == big, np.int32(nnz), arg)
        counts = jnp.bincount(rows, length=m)
        values = jnp.where((counts > 0)[:, None], ext, 0.0)
        return values, arg
    if reduce == "mul":
        return jax.ops.segment_prod(gathered, rows, num_segments=m)
    if reduce == "div":
        # running val /= new from init 1 == reciprocal of the product
        return 1.0 / jax.ops.segment_prod(gathered, rows, num_segments=m)
    raise ValueError(f"unknown reduce mode {reduce!r}")


@jax.jit
def sddmm_reference(a_pattern: CSR, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sampled dense-dense matmul: out[k] = (X @ Y)[row_k, col_k].

    Returns per-nonzero values in a_pattern's order — the mathematically
    right dA gradient for SpMM (restricted to A's pattern), which the
    reference approximates by densify->CSR->full SpMM (matmuls.py:245-256).
    """
    rows = a_pattern.row_ids()
    # Per-nonzero dot product of X row and Y column.
    return jnp.einsum(
        "nk,nk->n",
        x[rows],
        y[:, a_pattern.indices].T,
        precision=jax.lax.Precision.HIGHEST,
    )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DIA:
    """Diagonal-format sparse matrix (banded storage, row-centric).

    ``data[d, i] = A[i, i + offsets[d]]`` (entries whose i+offset falls
    outside [0, ncols) are structural zeros). ``offsets`` is HOST numpy,
    sorted ascending — a static pattern like every tpusparse pattern.

    This is the gather-free format: SpMV/SpMM is a sum of statically-
    shifted elementwise multiplies (one dynamic_slice per diagonal), so
    it runs at HBM streaming rate on TPU where index-driven formats pay
    the ~60M-scalar-gathers/s XLA gather ceiling — measured 668x faster
    on a 1M-row pentadiagonal operator (0.12 ms vs 83 ms, 42 Gnnz/s).
    Note scipy.sparse.dia_matrix stores column-centric
    (``data[d, j] = A[j - offsets[d], j]``); from_scipy/to_scipy convert.
    """

    data: jnp.ndarray  # (noffsets, nrows)
    offsets: np.ndarray  # host numpy int64, sorted, static
    shape: Shape2

    def __post_init__(self):
        offs = np.asarray(self.offsets, np.int64)
        if offs.ndim != 1 or (np.diff(offs) <= 0).any():
            raise ValueError("DIA offsets must be 1-D, sorted, unique")
        object.__setattr__(self, "offsets", offs)

    @property
    def noffsets(self) -> int:
        return int(self.offsets.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def bandwidth(self) -> int:
        return int(np.abs(self.offsets).max(initial=0))

    def tree_flatten(self):
        # offsets are aux data: the pattern is static, like CSR shape
        return (self.data,), (tuple(self.offsets.tolist()), self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            data=children[0],
            offsets=np.asarray(aux[0], np.int64),
            shape=aux[1],
        )

    def _valid_mask(self) -> np.ndarray:
        """(noff, m) bool: which slots map to in-bounds columns."""
        m, k = self.shape
        i = np.arange(m, dtype=np.int64)[None, :]
        j = i + self.offsets[:, None]
        return (j >= 0) & (j < k)

    def transpose(self) -> "DIA":
        """Aᵀ as DIA: offsets negate (re-sorted ascending) and each
        diagonal's values shift — Aᵀ[j, j+off'] with off' = -off equals
        A[j - off', j], stored at data[d, j - off']. Host-static slice
        arithmetic per diagonal; values ride pure jnp ops."""
        m, k = self.shape
        concrete = not isinstance(self.data, jax.core.Tracer)
        src = np.asarray(self.data) if concrete else self.data
        rows_new = []
        for d in range(self.noffsets - 1, -1, -1):
            off = int(self.offsets[d])
            row = src[d]
            lo = max(0, off)
            hi = min(k, m + off)
            if concrete:
                # host path: eager per-diagonal TPU slices cost ~0.65 s of
                # XLA compile EACH (measured 29 s for a 5-diagonal 1M-row
                # transpose during AMG setup)
                t = np.zeros((k,), src.dtype)
                if hi > lo:
                    t[lo:hi] = row[lo - off : hi - off]
            else:
                t = jnp.zeros((k,), self.dtype)
                if hi > lo:
                    t = t.at[lo:hi].set(row[lo - off : hi - off])
            rows_new.append(t)
        data = (
            jnp.asarray(np.stack(rows_new))
            if concrete
            else jnp.stack(rows_new)
        )
        return DIA(
            data=data,
            offsets=np.sort(-self.offsets[::-1]),
            shape=(k, m),
        )

    @property
    def T(self) -> "DIA":
        return self.transpose()

    @classmethod
    def from_dense(cls, mat) -> "DIA":
        mat = np.asarray(mat)
        m, k = _static_shape(mat.shape)
        i, j = np.nonzero(mat)
        offs = np.unique(j.astype(np.int64) - i.astype(np.int64))
        data = np.zeros((offs.size, m), mat.dtype)
        slot = np.searchsorted(offs, j.astype(np.int64) - i)
        data[slot, i] = mat[i, j]
        return cls(data=jnp.asarray(data), offsets=offs, shape=(m, k))

    def to_dense(self) -> jnp.ndarray:
        m, k = self.shape
        out = jnp.zeros((m, k), self.dtype)
        i = np.arange(m, dtype=np.int64)
        mask = self._valid_mask()
        for d, off in enumerate(self.offsets):
            ii = i[mask[d]]
            out = out.at[ii, ii + int(off)].set(self.data[d][jnp.asarray(mask[d])])
        return out

    def report(self, n_cols: int = 256, dtype_bytes: int = 4) -> dict:
        """Stats + projected roofline, same contract as `Plan.report` so
        `utils.profiling.kernel_report`/`measured_roofline` accept DIA.

        The kernel is pure streaming (no gathers): per diagonal it reads
        the (m,) value row and an (m, n) shifted slab of B, writes the
        (m, n) output once — memory-bound by construction.
        """
        from tpusparse.plan import _ROOFLINE

        m, k = self.shape
        stored = self.noffsets * m
        nnz = int(self._valid_mask().sum())
        bytes_moved = float(
            dtype_bytes * (stored + stored * n_cols + m * n_cols)
        )
        t = bytes_moved / _ROOFLINE["hbm_bandwidth"]
        useful = 2.0 * nnz * n_cols
        return {
            "format": "dia",
            "noffsets": float(self.noffsets),
            "bandwidth": float(self.bandwidth),
            "nnz": float(nnz),
            "density": nnz / float(m * k),
            "pad_overhead": stored / max(nnz, 1) - 1.0,
            "useful_flops": useful,
            "bytes_moved": bytes_moved,
            "arithmetic_intensity": useful / bytes_moved,
            "projected_time_s": t,
            "projected_gflops_effective": useful / t / 1e9,
            "projected_nnz_per_s": nnz * n_cols / t,
            "bound": "memory",
        }

    @classmethod
    def from_scipy(cls, sp) -> "DIA":
        sp = sp.todia()
        offs = np.asarray(sp.offsets, np.int64)
        order = np.argsort(offs)
        m, k = _static_shape(sp.shape)
        data = np.zeros((offs.size, m), sp.data.dtype)
        # scipy: data[d, j] = A[j - off, j]  ->  ours: data[d, i] = A[i, i+off]
        # NOTE scipy trims its data width to col.max()+1 when trailing
        # columns are empty — clamp j to what is actually stored
        width = sp.data.shape[1]
        for out_d, d in enumerate(order):
            off = int(offs[d])
            j = np.arange(
                max(0, off), min(k, m + off, width), dtype=np.int64
            )
            data[out_d, j - off] = sp.data[d, j]
        return cls(data=jnp.asarray(data), offsets=offs[order], shape=(m, k))

    def to_scipy(self):
        import scipy.sparse as ssp

        m, k = self.shape
        data = np.zeros((self.noffsets, k), np.asarray(self.data).dtype)
        ours = np.asarray(self.data)
        for d, off in enumerate(self.offsets):
            off = int(off)
            j = np.arange(max(0, off), min(k, m + off), dtype=np.int64)
            data[d, j] = ours[d, j - off]
        return ssp.dia_matrix((data, self.offsets), shape=self.shape)


def csr_to_dia(a: CSR, max_offsets: int = 128) -> DIA:
    """CSR -> DIA (host pattern pass). Raises when the pattern spreads
    over more than ``max_offsets`` distinct diagonals — DIA storage is
    noffsets × nrows, so scattered patterns do not belong here (the
    spmm router checks occupancy before taking this path)."""
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices).astype(np.int64)
    m, k = a.shape
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    offs_all = indices - rows
    offs = np.unique(offs_all)
    if offs.size > max_offsets:
        raise ValueError(
            f"pattern has {offs.size} distinct diagonals (> {max_offsets}); "
            "not a banded matrix — use CSR executors"
        )
    slot = np.searchsorted(offs, offs_all)
    if isinstance(a.data, jax.core.Tracer):
        # traced values: one differentiable device scatter
        data = (
            jnp.zeros((offs.size, m), a.dtype)
            .at[
                (
                    jnp.asarray(slot.astype(np.int32)),
                    jnp.asarray(rows.astype(np.int32)),
                )
            ]
            .set(a.data)
        )
    else:
        # concrete values: fill on host (a 5M-entry eager 2-D device
        # scatter measured ~3 min of XLA compile+run during AMG setup)
        host = np.zeros((offs.size, m), np.asarray(a.data).dtype)
        host[slot, rows] = np.asarray(a.data)
        data = jnp.asarray(host)
    return DIA(data=data, offsets=offs, shape=a.shape)


def dia_to_csr(a: DIA) -> CSR:
    """DIA -> CSR with every VALID slot kept as a structural entry
    (consistent with the framework's structural-pattern semantics)."""
    m, k = a.shape
    mask = a._valid_mask()
    d_idx, i_idx = np.nonzero(mask)
    cols = i_idx + a.offsets[d_idx]
    order = np.lexsort((cols, i_idx))
    d_idx, i_idx, cols = d_idx[order], i_idx[order], cols[order]
    indptr = np.zeros(m + 1, np.int64)
    np.cumsum(np.bincount(i_idx, minlength=m), out=indptr[1:])
    return CSR(
        data=a.data[
            (jnp.asarray(d_idx.astype(np.int32)), jnp.asarray(i_idx.astype(np.int32)))
        ],
        indices=cols.astype(np.int32),
        indptr=indptr.astype(np.int32),
        shape=a.shape,
    )
