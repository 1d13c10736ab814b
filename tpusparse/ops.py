"""Public op surface with autograd — TPU-native analog of the reference's
`torch.autograd.InplaceFunction` layer (matmuls.py:81-176, :238-327).

Every op is a `jax.custom_vjp` whose backward passes run through this
framework's own kernels, mirroring the reference architecture:

  dense mm family   dA = dC·Bᵀ, dB = Aᵀ·dC via our matmul      (matmuls.py:91-104)
  spmm (tiled)      dA = SDDMM(dC, B) restricted to A's pattern (Pallas kernel;
                    the reference instead densifies dC and runs a full SpMM,
                    matmuls.py:245-256 — BASELINE.json upgrades this to SDDMM)
                    dB = Aᵀ·dC via the transpose plan (Pallas tiled SpMM)
  naive spmm        same algebra on the XLA gather/segment path

Transposed dense variants re-derive the correct gradient algebra rather
than copying the reference's flag-reapplication quirk (matmuls.py:119-126;
see SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse import dense
from tpusparse.kernels.naive_spmm import ell_pack, naive_spmm_pallas
from tpusparse.kernels.sddmm import sddmm_pallas
from tpusparse.kernels.tiled_spmm import (
    footprint_spmm_pallas,
    resident_spmm_pallas,
    resident_vmem_bytes,
    tiled_spmm_pallas,
)
from tpusparse.plan import Plan, build_plan_pair, _fingerprint
from tpusparse.types import CSR, sddmm_reference, spmm_reference


def _zeros_tangent(tree):
    """Zero cotangents for non-differentiable (integer) pytree args."""
    return jax.tree_util.tree_map(
        lambda x: (
            jnp.zeros_like(x)
            if jnp.issubdtype(x.dtype, jnp.inexact)
            else np.zeros(x.shape, dtype=jax.dtypes.float0)
        ),
        tree,
    )


# ----------------------------------------------------------------------------
# Dense ops: mm / transa_mm / transb_mm / transab_mm
# (analog of cublasMM / cublasTransaMM / cublasTransbMM / cublasTransabMM)
# ----------------------------------------------------------------------------


def _make_dense_op(transa: bool, transb: bool):
    @jax.custom_vjp
    def op(a, b):
        return dense.matmul(a, b, transa=transa, transb=transb)

    def fwd(a, b):
        return op(a, b), (a, b)

    def bwd(res, g):
        a, b = res
        # Correct gradient algebra for C = op_a(A) @ op_b(B):
        if not transa:
            da = dense.matmul(g, b, transb=not transb)
        elif not transb:
            da = dense.matmul(b, g, transb=True)
        else:
            da = dense.matmul(b, g, transa=True, transb=True)
        if not transb:
            db = dense.matmul(a, g, transa=not transa)
        elif not transa:
            db = dense.matmul(g, a, transa=True)
        else:
            db = dense.matmul(g, a, transa=True, transb=True)
        return da, db

    op.defvjp(fwd, bwd)

    def checked(a, b):
        if a.ndim != b.ndim or a.ndim < 2:
            raise ValueError(
                f"dense ops need same-rank ≥2-D operands, got {a.shape} x "
                f"{b.shape}; use tpusparse.dense.matmul for mixed ranks"
            )
        return op(a, b)

    return checked


mm = _make_dense_op(False, False)
transa_mm = _make_dense_op(True, False)
transb_mm = _make_dense_op(False, True)
transab_mm = _make_dense_op(True, True)


# ----------------------------------------------------------------------------
# Tiled SpMM with autograd (the performance path)
# ----------------------------------------------------------------------------


def _block_exec(plan: Plan, block_vals, b, **kw):
    """Executor dispatch for plan-driven block SpMM: the resident-B-panel
    kernel when the panel fits the VMEM budget AND the pattern re-uses it
    (≥1 occupied block per block-column on average — below that the
    ELL-ring's per-occupied-tile fetches move fewer bytes than one full
    panel). Both consume the same (plan, packed values) and produce
    bitwise-identical output, so this is a pure perf decision.
    """
    from tpusparse.utils.config import get_config, round_up

    cfg = get_config()
    n = b.shape[-1]
    bn = min(kw.get("block_n") or cfg.spmm_block_n, round_up(n, 128))
    if (
        plan.nblocks >= plan.num_col_blocks
        and resident_vmem_bytes(plan, n, b.dtype.itemsize, bn)
        <= cfg.vmem_limit_bytes
    ):
        return resident_spmm_pallas(plan, block_vals, b, **kw)
    return tiled_spmm_pallas(plan, block_vals, b, **kw)


@jax.custom_vjp
def _tiled_spmm(plan: Plan, plan_t: Plan, t_perm, data, b):
    block_vals = plan.pack_values(data)
    return _block_exec(plan, block_vals, b)


def _tiled_spmm_fwd(plan, plan_t, t_perm, data, b):
    return _tiled_spmm(plan, plan_t, t_perm, data, b), (
        plan,
        plan_t,
        t_perm,
        data,
        b,
    )


def _tiled_spmm_bwd(res, g):
    plan, plan_t, t_perm, data, b = res
    # dA restricted to A's pattern: SDDMM Pallas kernel on the block plan.
    d_blocks = sddmm_pallas(plan, g, b)
    d_data = plan.unpack_values(d_blocks)
    # dB = Aᵀ · dC through the transpose plan (another tiled SpMM).
    bv_t = plan_t.pack_values(data[t_perm])
    db = _block_exec(plan_t, bv_t, g)
    return (
        _zeros_tangent(plan),
        _zeros_tangent(plan_t),
        np.zeros(t_perm.shape, dtype=jax.dtypes.float0),
        d_data,
        db.astype(b.dtype),
    )


_tiled_spmm.defvjp(_tiled_spmm_fwd, _tiled_spmm_bwd)


def _batched_resident_ok(plan: Plan, b) -> bool:
    """Can a 3-D b take the batch-grid resident executor? (panel + the
    WHOLE vals array resident — kernels/tiled_spmm.py batched section)."""
    from tpusparse.kernels.tiled_spmm import resident_batched_vmem_bytes
    from tpusparse.utils.config import get_config, round_up

    cfg = get_config()
    n = b.shape[-1]
    bn = min(cfg.spmm_block_n, round_up(n, 128))
    return (
        plan.nblocks >= plan.num_col_blocks
        # narrow per-element panels (n < 256) pad to 128 lanes AND blow
        # the grid up to batch x nbr tiny cells (bert4d: 4096 x 4 cells
        # of one 4-slot loop each) — the single folded launch wins there
        and round_up(n, 128) >= 256
        and resident_batched_vmem_bytes(plan, b.dtype.itemsize, bn)
        <= cfg.vmem_limit_bytes
    )


@jax.custom_vjp
def _tiled_spmm_b3(plan: Plan, plan_t: Plan, t_perm, data, b):
    """3-D b on the batch-grid resident executor: no fold transposes
    (measured 0.65 ms of the r4 batch-32 row), vals stream once per
    launch instead of once per (batch · n-tile)."""
    from tpusparse.kernels.tiled_spmm import resident_spmm_batched_pallas

    return resident_spmm_batched_pallas(plan, plan.pack_values(data), b)


def _tiled_spmm_b3_fwd(plan, plan_t, t_perm, data, b):
    return _tiled_spmm_b3(plan, plan_t, t_perm, data, b), (
        plan, plan_t, t_perm, data, b,
    )


def _tiled_spmm_b3_bwd(res, g):
    plan, plan_t, t_perm, data, b = res
    from tpusparse.kernels.tiled_spmm import resident_spmm_batched_pallas

    # dA: SDDMM over the batch folded into columns — the fold IS the
    # batch sum the pattern-restricted gradient needs
    d_blocks = sddmm_pallas(plan, _fold_cols(g), _fold_cols(b))
    d_data = plan.unpack_values(d_blocks)
    # dB[g] = Aᵀ · dC[g]: same batched executor through the transpose plan
    bv_t = plan_t.pack_values(data[t_perm])
    if _batched_resident_ok(plan_t, g):
        db = resident_spmm_batched_pallas(plan_t, bv_t, g)
    else:
        db = _fold_batch(lambda gg: _block_exec(plan_t, bv_t, gg), g)
    return (
        _zeros_tangent(plan),
        _zeros_tangent(plan_t),
        np.zeros(t_perm.shape, dtype=jax.dtypes.float0),
        d_data,
        db.astype(b.dtype),
    )


_tiled_spmm_b3.defvjp(_tiled_spmm_b3_fwd, _tiled_spmm_b3_bwd)


@jax.custom_vjp
def _resident_spmm(plan: Plan, plan_t: Plan, t_perm, data, b):
    # forced resident executor (raises if the B panel exceeds VMEM);
    # gradient algebra identical to the tiled path
    return resident_spmm_pallas(plan, plan.pack_values(data), b)


def _resident_spmm_fwd(plan, plan_t, t_perm, data, b):
    return _resident_spmm(plan, plan_t, t_perm, data, b), (
        plan, plan_t, t_perm, data, b,
    )


_resident_spmm.defvjp(_resident_spmm_fwd, _tiled_spmm_bwd)


def resident_spmm(
    a: CSR, b: jnp.ndarray, blocksize: Optional[Tuple[int, int]] = None
) -> jnp.ndarray:
    """Block SpMM with the whole B n-panel resident in VMEM (forced).

    The limit case of the reference's footprint compression
    (sparse_mm.cu:163-187): B traffic drops to one panel load per n-tile
    and the per-slot critical path loses its HBM gather. Raises if the
    (k, block_n) panel exceeds the VMEM budget — `tiled_spmm`/'auto'
    make this call automatically when profitable. Differentiable.
    """
    _check_spmm_b(a, b)
    plan, plan_t, t_perm = build_plan_pair(a, blocksize)
    if b.ndim == 2:
        return _resident_spmm(plan, plan_t, t_perm, a.data, b)
    if b.ndim == 3:
        # batch-grid kernel when the whole vals array also fits VMEM (no
        # fold transposes, vals stream once); else fold — the resident
        # panel is per-n-tile (kp, bn), so folded width costs no extra
        # VMEM, only more n-grid cells
        if _batched_resident_ok(plan, b):
            return _tiled_spmm_b3(plan, plan_t, t_perm, a.data, b)
        return _fold_batch(
            lambda bb: _resident_spmm(plan, plan_t, t_perm, a.data, bb), b
        )
    raise ValueError(f"resident_spmm supports 2-D/3-D b, got {b.shape}")


@jax.custom_vjp
def _footprint_spmm(plan: Plan, plan_t: Plan, t_perm, fplan, data, b):
    return footprint_spmm_pallas(fplan, fplan.pack_values(data), b)


def _footprint_spmm_fwd(plan, plan_t, t_perm, fplan, data, b):
    return _footprint_spmm(plan, plan_t, t_perm, fplan, data, b), (
        plan, plan_t, t_perm, fplan, data, b,
    )


def _footprint_spmm_bwd(res, g):
    plan, plan_t, t_perm, fplan, data, b = res
    # same gradient algebra as the tiled path: the backward kernels key on
    # the base ELL plan, independent of the forward's footprint packing
    d_data = plan.unpack_values(sddmm_pallas(plan, g, b))
    db = _block_exec(plan_t, plan_t.pack_values(data[t_perm]), g)
    return (
        _zeros_tangent(plan),
        _zeros_tangent(plan_t),
        np.zeros(t_perm.shape, dtype=jax.dtypes.float0),
        _zeros_tangent(fplan),
        d_data,
        db.astype(b.dtype),
    )


_footprint_spmm.defvjp(_footprint_spmm_fwd, _footprint_spmm_bwd)


def footprint_spmm(
    a: CSR,
    b: jnp.ndarray,
    blocksize: Optional[Tuple[int, int]] = None,
    rows_per_super: int = 16,
) -> jnp.ndarray:
    """B-tile-reuse SpMM (footprint executor; see plan.FootprintPlan).

    The TPU analog of the reference inspector's footprint compression
    (sparse_mm.cu:163-187): one kernel cell owns `rows_per_super`
    row-blocks with slots sorted by column, so each distinct column's B
    tile is fetched once per super-row. Differentiable like tiled_spmm.
    """
    _check_spmm_b(a, b)
    from tpusparse.plan import footprint_plan

    plan, plan_t, t_perm = build_plan_pair(a, blocksize)
    fplan = footprint_plan(plan, rows_per_super=rows_per_super)
    if b.ndim == 2:
        return _footprint_spmm(plan, plan_t, t_perm, fplan, a.data, b)
    if b.ndim == 3:
        return _fold_batch(
            lambda bb: _footprint_spmm(
                plan, plan_t, t_perm, fplan, a.data, bb
            ),
            b,
        )
    raise ValueError(f"footprint_spmm supports 2-D/3-D b, got {b.shape}")


def tiled_spmm(
    a: CSR,
    b: jnp.ndarray,
    blocksize: Optional[Tuple[int, int]] = None,
    plans=None,
) -> jnp.ndarray:
    """Inspector-executor SpMM: C = A @ B (A sparse CSR, B dense 2-D/3-D).

    Plans are built once per pattern (host-side) and cached by fingerprint —
    the analog of tiledspmm_inspect_* + tiledspmm_mm keyed by layer name
    (custom_mm.cpp:283-357). Pass `plans=build_plan_pair(...)` explicitly
    when calling under jit with traced values.
    """
    _check_spmm_b(a, b)
    plan, plan_t, t_perm = plans or build_plan_pair(a, blocksize)
    if b.ndim == 2:
        return _tiled_spmm(plan, plan_t, t_perm, a.data, b)
    if b.ndim == 3:
        # Shared pattern across batch: batch-grid resident executor when
        # panel + whole-vals fit VMEM (r4 verdict #4 — the fold's
        # transposes and per-(batch·n-tile) vals re-stream were 6.35x
        # over the traffic bound); else ONE folded launch (the
        # reference's flatten, matmuls.py:282-288).
        if _batched_resident_ok(plan, b):
            return _tiled_spmm_b3(plan, plan_t, t_perm, a.data, b)
        return _fold_batch(
            lambda bb: _tiled_spmm(plan, plan_t, t_perm, a.data, bb), b
        )
    raise ValueError(f"tiled_spmm supports 2-D/3-D b, got {b.shape}")


# ----------------------------------------------------------------------------
# Block-form SpMM (differentiable; used by the distributed/TP layers where
# parameters live directly in ELL block form with a static 0/1 block mask)
# ----------------------------------------------------------------------------


@jax.custom_vjp
def _spmm_blocks_vjp(plan: Plan, blocks, b):
    return _block_exec(plan, blocks, b)


def spmm_blocks(plan: Plan, blocks, b):
    """C = A @ B where A is given as the plan's packed ELL blocks.

    Neither the executors nor this op's backward read plan.scatter_idx
    (values are already packed), so it is stripped before the
    custom_vjp: pytree leaves staged through a custom_vjp embed as HLO
    literals under jit, and an nnz-sized scatter array (~107MB at 26.8M
    nnz) exceeds the axon tunnel's compile-payload limit (HTTP 413).
    """
    import dataclasses

    if (
        isinstance(plan.scatter_idx, np.ndarray)
        and plan.scatter_idx.size > 0
    ):
        plan = dataclasses.replace(
            plan, scatter_idx=np.zeros((0,), np.int32)
        )
    return _spmm_blocks_vjp(plan, blocks, b)


def _spmm_blocks_fwd(plan, blocks, b):
    return _spmm_blocks_vjp(plan, blocks, b), (plan, blocks, b)


def _db_blocks_traced(plan: Plan, blocks, g):
    """dB = Aᵀ·dC for a plan whose pattern arrays are TRACED (the
    shard_map training path passes per-shard block_cols/nslots as
    operands). Jittable slot-wise form: each valid slot contributes
    blockᵀ @ g[row-block] scatter-added at its column block — never
    densifies A (the pre-r2 fallback scattered the full (m, k) matrix
    every training step)."""
    bm, bk = plan.blocksize
    nbr, nbc, L = plan.num_row_blocks, plan.num_col_blocks, plan.ell_width
    m, k = plan.shape
    n = g.shape[1]
    if nbr * bm != m:
        g = jnp.pad(g, ((0, nbr * bm - m), (0, 0)))
    gb = g.reshape(nbr, bm, n)
    blk = blocks.reshape(nbr, L, bm, bk)
    blk = blk * plan.slot_valid_mask()[..., None, None].astype(blk.dtype)
    contrib = jnp.einsum(
        "ilmk,imn->ilkn", blk, gb, precision=jax.lax.Precision.HIGHEST
    )
    db4 = (
        jnp.zeros((nbc, bk, n), contrib.dtype)
        .at[jnp.asarray(plan.block_cols)]
        .add(contrib)
    )
    return db4.reshape(nbc * bk, n)[:k]


def _spmm_blocks_bwd(res, g):
    plan, blocks, b = res
    dblocks = sddmm_pallas(plan, g, b).astype(blocks.dtype)
    # dB = Aᵀ·dC in BLOCK form: the transpose plan + slot permutation are
    # derived from the forward plan's block pattern (plan.py
    # block_transpose_plan), so the backward runs the same tiled/resident
    # executor — no (m, k) densify (the former fallback scattered the
    # full dense A every training step). Traced patterns (shard_map
    # operands) take the jittable slot-scatter form instead.
    try:
        np.asarray(plan.block_cols)
        concrete = True
    except Exception:
        concrete = False
    if not concrete:
        db = _db_blocks_traced(plan, blocks, g)
        return _zeros_tangent(plan), dblocks, db.astype(b.dtype)
    from tpusparse.plan import block_transpose_plan

    plan_t, t_slot_perm = block_transpose_plan(plan)
    bm, bk = plan.blocksize
    blocks_ext = jnp.concatenate(
        [jnp.swapaxes(blocks, 1, 2),
         jnp.zeros((1, bk, bm), blocks.dtype)]  # pad slots -> zero block
    )
    db = _block_exec(plan_t, blocks_ext[jnp.asarray(t_slot_perm)], g)
    return _zeros_tangent(plan), dblocks, db.astype(b.dtype)


_spmm_blocks_vjp.defvjp(_spmm_blocks_fwd, _spmm_blocks_bwd)


# ----------------------------------------------------------------------------
# Naive SpMM with autograd (XLA-gather backward; supports reducers fwd-only)
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _naive_spmm(shape, width, csr_arrays, b):
    data, indices, indptr = csr_arrays
    a = CSR(data=data, indices=indices, indptr=indptr, shape=shape)
    ell = ell_pack_traced(a, width=width)
    return naive_spmm_pallas(ell, shape, b, reduce="sum")


def _naive_spmm_fwd(shape, width, csr_arrays, b):
    return _naive_spmm(shape, width, csr_arrays, b), (csr_arrays, b)


def _naive_spmm_bwd(shape, width, res, g):
    (data, indices, indptr), b = res
    a = CSR(data=data, indices=indices, indptr=indptr, shape=shape)
    rows = a.row_ids()
    # dA[t] = g[row_t, :] · b[col_t, :]  (pattern-restricted, like SDDMM)
    d_data = jnp.einsum(
        "nc,nc->n", g[rows], b[indices], precision=jax.lax.Precision.HIGHEST
    ).astype(data.dtype)
    # dB = Aᵀ·dC on the gather/scatter path
    db = jnp.zeros_like(b).at[indices].add(data[:, None] * g[rows])
    i0 = np.zeros(indices.shape, dtype=jax.dtypes.float0)
    p0 = np.zeros(indptr.shape, dtype=jax.dtypes.float0)
    return (d_data, i0, p0), db


_naive_spmm.defvjp(_naive_spmm_fwd, _naive_spmm_bwd)


# ----------------------------------------------------------------------------
# Gather SpMM — pure-XLA take/scatter-add, the low-fill performance path.
# On patterns with ~1 nnz per occupied block, any block-executor pays a
# whole (bk, n) B-tile fetch per nonzero; XLA's fused row gather +
# scatter-add moves exactly nnz·n elements and runs at HBM bandwidth
# (measured 5x faster than the Pallas block executors at 5e-5 density on
# v5e). This is the idiomatic TPU answer to the reference's warp-per-row
# kernel regime, so 'auto' routes low-fill patterns here.
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_spmm(shape, coo_arrays, b):
    data, indices, rows = coo_arrays
    contrib = jnp.take(b, indices, axis=0) * data[:, None]
    out_dtype = jnp.promote_types(data.dtype, b.dtype)
    # CSR order means rows is nondecreasing — telling XLA saves the
    # scatter's sort/hash path (~20% measured on v5e)
    return (
        jnp.zeros((shape[0], b.shape[1]), out_dtype)
        .at[rows]
        .add(contrib, indices_are_sorted=True, unique_indices=False)
    )


def _gather_spmm_fwd(shape, coo_arrays, b):
    return _gather_spmm(shape, coo_arrays, b), (coo_arrays, b)


def _gather_spmm_bwd(shape, res, g):
    (data, indices, rows), b = res
    # dA[t] = g[row_t, :] · b[col_t, :] (pattern-restricted, like SDDMM)
    d_data = jnp.einsum(
        "nc,nc->n", g[rows], b[indices], precision=jax.lax.Precision.HIGHEST
    ).astype(data.dtype)
    db = jnp.zeros_like(b).at[indices].add(data[:, None] * g[rows])
    i0 = np.zeros(indices.shape, dtype=jax.dtypes.float0)
    r0 = np.zeros(rows.shape, dtype=jax.dtypes.float0)
    return (d_data, i0, r0), db


_gather_spmm.defvjp(_gather_spmm_fwd, _gather_spmm_bwd)


# ----------------------------------------------------------------------------
# Batch folding — batched B with a SHARED sparse pattern is mathematically
# ONE SpMM against B folded along columns: (batch, k, n) -> (k, batch·n).
# This is the reference's own batched-dispatch recipe (its dispatcher
# flattens batched B to a single 2-D operand, matmuls.py:282-288, and its
# naive kernel folds batch into the launch grid, naive_sparse_mm.cu:114-116)
# done the TPU way: the executors already tile n in bn-sized grid cells, so
# the fold turns a serialized lax.map (one kernel launch per batch element)
# into ONE launch whose n-grid covers every batch element — at the cost of
# one transposing copy of B and C each at HBM bandwidth.
# ----------------------------------------------------------------------------

# Cap on the (nnz, cols) fp32 intermediate that the XLA gather/scatter and
# segment-sum paths materialize: past this, the fold runs in batch chunks.
_FOLD_INTERMEDIATE_BYTES = 1 << 30


def _fold_cols(b: jnp.ndarray) -> jnp.ndarray:
    """(batch, k, n) -> (k, batch·n)."""
    batch, k, n = b.shape
    return jnp.swapaxes(b, 0, 1).reshape(k, batch * n)


def _unfold_cols(c: jnp.ndarray, batch: int, n: int) -> jnp.ndarray:
    """(m, batch·n) -> (batch, m, n)."""
    return jnp.swapaxes(c.reshape(c.shape[0], batch, n), 0, 1)


def _fold_batch(op2d, b: jnp.ndarray, max_cols: int | None = None):
    """Run a 2-D SpMM `op2d((k, cols)) -> (m, cols)` on batched
    (batch, k, n) input by folding batch into the column axis.

    One kernel launch replaces the per-batch-element lax.map. `max_cols`
    bounds the folded width for ops that materialize an (nnz, cols)
    intermediate (gather / reference segment paths) — past it the fold
    runs chunked under one lax.map (chunk size still >= 1 batch element,
    so worst case degrades to the old per-element behavior). Pytree
    outputs (e.g. return_arg tuples) are unfolded leaf-wise.
    """
    from tpusparse.utils.config import cdiv

    batch, k, n = b.shape
    if max_cols is None or batch * n <= max_cols:
        out = op2d(_fold_cols(b))
        return jax.tree_util.tree_map(
            lambda x: _unfold_cols(x, batch, n), out
        )
    per = max(int(max_cols) // max(n, 1), 1)
    nchunk = cdiv(batch, per)
    pad = nchunk * per - batch
    bp = jnp.pad(b, ((0, pad), (0, 0), (0, 0))) if pad else b
    bc = bp.reshape(nchunk, per, k, n)
    out = jax.lax.map(
        lambda bb: jax.tree_util.tree_map(
            lambda x: _unfold_cols(x, per, n), op2d(_fold_cols(bb))
        ),
        bc,
    )
    return jax.tree_util.tree_map(
        lambda x: x.reshape((nchunk * per,) + x.shape[2:])[:batch], out
    )


def _gather_fold_cols(nnz: int) -> int:
    """Max folded columns for the (nnz, cols) fp32 gather intermediate."""
    return max(_FOLD_INTERMEDIATE_BYTES // (4 * max(int(nnz), 1)), 1)


def _check_spmm_b(a, b) -> None:
    """Reject a k-mismatched dense operand eagerly: XLA gathers CLAMP
    out-of-bounds row indices, so a wrong-shaped b would otherwise return
    silently wrong values on the gather path (found by an error probe)."""
    if b.ndim < 2 or b.shape[-2] != a.shape[1]:
        raise ValueError(
            f"b shape {b.shape} incompatible with sparse operand "
            f"{a.shape} (need b.shape[-2] == {a.shape[1]})"
        )


def gather_spmm(a: CSR, b: jnp.ndarray) -> jnp.ndarray:
    """XLA gather/scatter-add SpMM (differentiable; low-fill perf path)."""
    _check_spmm_b(a, b)
    if b.ndim == 3:
        # fold batch into columns; chunk so the (nnz, cols) contrib
        # intermediate stays bounded
        return _fold_batch(
            lambda bb: gather_spmm(a, bb), b, _gather_fold_cols(a.nnz)
        )
    # CSR.row_ids() already does host expansion for concrete patterns
    # with the jittable searchsorted fallback for traced ones
    return _gather_spmm(a.shape, (a.data, a.indices, a.row_ids()), b)


_DIA_PATTERN_CACHE: dict = {}


def _dia_pattern(a: CSR, max_offsets: int):
    """Fingerprint-cached (offsets, slot, rows) of a CSR pattern's
    diagonal decomposition, or None if it spreads over too many
    diagonals. Host-only pattern work (trace-time constant)."""
    try:
        indptr = np.asarray(a.indptr)
        indices = np.asarray(a.indices)
    except Exception:
        return None  # traced pattern
    key = (_fingerprint(a.shape, (1, 1), indptr, indices), max_offsets)
    if key in _DIA_PATTERN_CACHE:
        return _DIA_PATTERN_CACHE[key]
    m, k = a.shape
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    offs_all = indices.astype(np.int64) - rows
    offs = np.unique(offs_all)
    if offs.size > max_offsets:
        hit = None
    else:
        hit = (
            offs,
            np.searchsorted(offs, offs_all).astype(np.int32),
            rows.astype(np.int32),
        )
    _DIA_PATTERN_CACHE[key] = hit
    return hit


def dia_spmm(a, b: jnp.ndarray) -> jnp.ndarray:
    """Gather-free banded SpMM: C = A @ B for a DIA operand.

    One statically-shifted `dynamic_slice` + elementwise multiply-add
    per diagonal — no index-driven memory access at all, so it streams
    at HBM rate where the gather path hits XLA's ~60M scalar-gathers/s
    ceiling (measured 668x on 1M-row pentadiagonal: 0.12 ms vs 83 ms).
    Structural zeros for out-of-range slots are guaranteed by the zero
    padding of B, so user-built DIA data needs no masking. Differentiable
    in both operands; fp32 products run on the VPU (exact fp32 — no MXU
    passes, no bf16 splitting needed).
    """
    from tpusparse.types import DIA

    if not isinstance(a, DIA):
        raise TypeError(f"dia_spmm needs a DIA operand, got {type(a)}")
    m, k = a.shape
    if b.ndim == 1:
        return dia_spmm(a, b[:, None])[:, 0]
    if b.shape[-2] != k:
        raise ValueError(
            f"b shape {b.shape} incompatible with sparse operand "
            f"{a.shape} (need b.shape[-2] == {k})"
        )
    if b.ndim == 3:
        return jax.vmap(lambda bb: dia_spmm(a, bb))(b)
    offs = np.asarray(a.offsets)
    lo = int(max(0, -offs.min(initial=0)))
    hi = int(max(0, offs.max(initial=0) + m - k))
    bp = jnp.pad(b, ((lo, hi), (0, 0)))
    acc = jnp.zeros((m, b.shape[1]), jnp.promote_types(a.dtype, b.dtype))
    nd = offs.size
    if nd <= 128:
        # fully unrolled: XLA sees nd static slices and fuses the chain
        for d, off in enumerate(offs):
            seg = jax.lax.dynamic_slice_in_dim(bp, lo + int(off), m, axis=0)
            acc = acc + a.data[d][:, None] * seg
        return acc
    # Many-diagonal operators (AMG's hybrid coarse levels carry 1000+):
    # full unrolling makes the HLO program O(nd) per matvec — a 10-iter
    # AMG-CG at laplace3d_64's L1 (1715 diagonals) never finished
    # compiling. Chunked lax.scan keeps the program O(U) with nd/U trips;
    # traced slice starts are in-range by construction (pad rows use
    # offset 0 with zero data, so they contribute nothing). Each scan
    # step costs ~20 µs of fixed overhead on the chip (measured r3:
    # 279 diagonals at n=2407 took 0.39 ms — scan-bound), so U trades
    # program size against step count; callers routing between formats
    # must charge ceil(nd/U)·20 µs (amg._route_level does).
    U = 32
    pad = (-nd) % U
    data = a.data
    offs_p = offs.astype(np.int64) + lo
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        offs_p = np.concatenate([offs_p, np.full(pad, lo, np.int64)])
    starts = jnp.asarray(offs_p.reshape(-1, U).astype(np.int32))
    chunks = data.reshape(-1, U, data.shape[1])

    if b.shape[1] == 1:
        # SpMV: the Pallas roll kernel (kernels/dia.py) keeps x resident
        # in VMEM — measured 1.5x over this scan at 1909 diagonals
        # (2.8 vs 4.3 ms, bitwise-equal output). XLA alternatives
        # measured worse: lane-major scan time-neutral, batched-shift
        # gather 2.5x slower (semi-scalarized row gather).
        from tpusparse.kernels.dia import dia_spmv

        return dia_spmv(a.data, np.asarray(a.offsets), b[:, 0])[:, None]

    def step(carry, xs):
        st, dc = xs  # (U,), (U, k-span)
        for u in range(U):
            seg = jax.lax.dynamic_slice_in_dim(bp, st[u], m, axis=0)
            carry = carry + dc[u][:, None] * seg
        return carry, None

    acc, _ = jax.lax.scan(step, acc, (starts, chunks))
    return acc


def resolve_ell_width(a: CSR) -> int:
    """Static ELL width (max row nnz) for a CSR pattern.

    MUST be called where the pattern arrays are still concrete — inside a
    custom_vjp or jit body they are tracers and only the worst-case
    min(nnz, k) bound is available, which overflows the kernel's 1MB SMEM
    prefetch budget on all but tiny shapes (this exact failure shipped:
    `ts.naive_spmm` under jit OOM'd SMEM at 512x512 @ 10%).
    """
    key = _ell_cache_key(a)
    if key is not None and key in _ELL_CACHE:
        return _ELL_CACHE[key]
    if key is not None:
        width = int(np.diff(np.asarray(a.indptr)).max(initial=1))
        _ELL_CACHE[key] = width
        return width
    return min(a.nnz, a.shape[1]) or 1  # traced indptr: worst case


def ell_pack_traced(a: CSR, width: int | None = None):
    """Jit-compatible ELL packing with width = static max row nnz.

    The width must be a trace-time constant; pass it explicitly when the
    pattern arrays may be tracers (see resolve_ell_width).
    """
    width = width or resolve_ell_width(a)
    m = a.shape[0]
    rows = a.row_ids()
    pos = jnp.arange(a.nnz, dtype=jnp.int32) - a.indptr[rows]
    flat = rows.astype(jnp.int32) * width + pos
    col_idx = (
        jnp.zeros((m * width,), jnp.int32).at[flat].set(a.indices).reshape(m, width)
    )
    vals = (
        jnp.zeros((m * width,), a.dtype).at[flat].set(a.data).reshape(m, width)
    )
    nnz_per_row = jnp.diff(a.indptr).astype(jnp.int32)
    return col_idx, vals, nnz_per_row


_ELL_CACHE = {}


def _ell_cache_key(a: CSR):
    try:
        indptr = np.asarray(a.indptr)
        indices = np.asarray(a.indices)
    except Exception:  # traced values
        return None
    return _fingerprint(a.shape, (1, 1), indptr, indices)


def naive_spmm(
    a: CSR, b: jnp.ndarray, reduce: str = "sum", return_arg: bool = False
) -> jnp.ndarray:
    """Naive gather SpMM (Pallas): analog of naiveSpMM.apply (matmuls.py:305).

    reduce='sum' is differentiable; other reducers (mean/max/min/mul, the
    reference Reducer modes) are forward-only. return_arg=True (min/max
    only) also returns the argmin/argmax nnz-index matrix — the
    reference's arg_out (naive_sparse_mm.cu:125-129).
    """
    _check_spmm_b(a, b)
    if return_arg and reduce not in ("min", "max"):
        raise ValueError("return_arg is only meaningful for reduce='min'/'max'")
    if b.ndim == 3:
        # every reducer (and the arg matrix) acts per output element, so
        # the column fold is exact for all modes — one launch per batch
        return _fold_batch(
            lambda bb: naive_spmm(a, bb, reduce, return_arg=return_arg), b
        )
    width = resolve_ell_width(a)  # here, before the pattern turns traced
    if reduce == "sum":
        return _naive_spmm(a.shape, width, (a.data, a.indices, a.indptr), b)
    return naive_spmm_pallas(
        ell_pack_traced(a, width=width),
        a.shape,
        b,
        reduce=reduce,
        return_arg=return_arg,
        # nnz only matters as the arg empty-row fill; keeping it 0 otherwise
        # avoids per-nnz recompiles of the plain forward reducers
        nnz=a.nnz if return_arg else 0,
    )


# ----------------------------------------------------------------------------
# SDDMM public op (new capability; reference lacks it — see module docstring)
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sddmm(shape, pattern_arrays, x, y):
    indices, indptr = pattern_arrays
    pat = CSR(jnp.zeros(indices.shape, x.dtype), indices, indptr, shape)
    return sddmm_reference(pat, x, y)


def _sddmm_fwd(shape, pattern_arrays, x, y):
    return _sddmm(shape, pattern_arrays, x, y), (pattern_arrays, x, y)


def _sddmm_bwd(shape, res, g):
    (indices, indptr), x, y = res
    s = CSR(g, indices, indptr, shape)  # sparse cotangent with A's pattern
    dx = spmm_reference(s, jnp.swapaxes(y, 0, 1))
    dy = jnp.swapaxes(spmm_reference(s.T, x), 0, 1)
    i0 = np.zeros(indices.shape, dtype=jax.dtypes.float0)
    p0 = np.zeros(indptr.shape, dtype=jax.dtypes.float0)
    return (i0, p0), dx.astype(x.dtype), dy.astype(y.dtype)


_sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


def sddmm(
    pattern: CSR, x: jnp.ndarray, y: jnp.ndarray, use_pallas: bool = False
) -> jnp.ndarray:
    """Pattern-restricted (X @ Y): returns per-nonzero values in CSR order.

    use_pallas=True routes through the block SDDMM kernel via a plan
    (forward only); the default XLA gather path is differentiable.
    """
    if use_pallas:
        plan, _, _ = build_plan_pair(pattern)
        blocks = sddmm_pallas(plan, x, jnp.swapaxes(y, 0, 1))
        return plan.unpack_values(blocks)
    return _sddmm(pattern.shape, (pattern.indices, pattern.indptr), x, y)


# ----------------------------------------------------------------------------
# Dense × sparse (DSMM): X @ A with the SPARSE operand on the right — the
# orientation every FC layer wants (activations @ sparse weightsᵀ). The
# reference has no such kernel (its cusparseLinear transposes activations
# through sparse_matmul's 2-D×3-D reshape quirks, matmuls.py:216-220);
# here it is spmm through the host-cached transposed pattern:
# X @ A = (Aᵀ @ Xᵀ)ᵀ, with Aᵀ built once per pattern fingerprint.
# ----------------------------------------------------------------------------


_T_CACHE = {}


def transpose_csr(a: CSR) -> CSR:
    """CSR transpose with the pattern work hoisted to the host.

    For concrete patterns the column-sort permutation is computed once
    per fingerprint and cached; per call the (traced) values ride one
    gather. Traced patterns fall back to the jittable CSR.transpose.
    """
    try:
        indptr = np.asarray(a.indptr)
        indices = np.asarray(a.indices)
    except Exception:  # traced pattern
        return a.T
    key = _fingerprint(a.shape, (1, 1), indptr, indices)
    hit = _T_CACHE.get(key)
    if hit is None:
        m, n = a.shape
        rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
        perm = np.argsort(indices, kind="stable")
        t_indices = rows[perm].astype(np.int32)
        t_indptr = np.zeros(n + 1, dtype=np.int32)
        t_indptr[1:] = np.cumsum(np.bincount(indices, minlength=n)).astype(
            np.int32
        )
        hit = (perm, t_indices, t_indptr)
        _T_CACHE[key] = hit
    perm, t_indices, t_indptr = hit
    # pattern arrays stay HOST numpy: jnp.asarray inside a jit trace would
    # stage them as traced constants, breaking downstream host inspectors
    # (build_plan etc.) — found driving dsmm(method='tiled') under jit
    return CSR(
        data=a.data[perm],
        indices=t_indices,
        indptr=t_indptr,
        shape=(a.shape[1], a.shape[0]),
    )


def dsmm(
    x: jnp.ndarray,
    a: CSR,
    method: str = "auto",
    blocksize: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Dense × sparse matmul: X @ A (A sparse CSR on the RIGHT).

    Computed as (Aᵀ @ Xᵀ)ᵀ through the cached transposed pattern, so it
    inherits every spmm method ('auto'/'tiled'/'gather'/...) and their
    autograd. 1-D x is the vector-matrix product xᵀA; N-D x batches over
    leading dims.
    """
    if x.ndim >= 1 and x.shape[-1] != a.shape[0]:
        raise ValueError(
            f"x shape {x.shape} incompatible with right sparse operand "
            f"{a.shape} (need x.shape[-1] == {a.shape[0]})"
        )
    from tpusparse.types import DIA

    at = a.transpose() if isinstance(a, DIA) else transpose_csr(a)
    if x.ndim == 1:
        return spmm(at, x, method=method, blocksize=blocksize)
    out = spmm(
        at, jnp.swapaxes(x, -1, -2), method=method, blocksize=blocksize
    )
    return jnp.swapaxes(out, -1, -2)


# ----------------------------------------------------------------------------
# Dispatching SpMM (analog of cusparseMM.apply / sparse_matmul routing)
# ----------------------------------------------------------------------------


_ROUTE_CACHE = {}

# Cost-model constants, fitted on TPU v5e measurements (n=256, 16384²):
# gather moves one ~1KB random B row per nonzero at ~80 GB/s effective;
# the tiled executor pays ~120ns of loop/DMA/MXU critical path per slot
# plus its B-tile gather traffic at ~600 GB/s; dense runs the MXU at the
# roofline constants PLUS the per-call densify scatter (~9 ns/nnz
# measured — spmm(a, b, method='dense') scatters A every call). See _cal
# sweeps recorded in BENCH_DETAILS.json.
# The constants live in a mutable dict so `tpusparse.calibrate()` can
# re-fit them on the local chip (different TPU generations move every
# one of these) and persist/load them via utils/calibrate.py. The
# defaults below are the v5e fit.
_COST_DEFAULTS = {
    "gather_row_bw": 80e9,
    # XLA's scalar-gather ceiling: measured 83 ms at n=1 and 73 ms at
    # n=128 for 5.2M nnz (≈15 ns/nnz EITHER way) — gather cost floors
    # per nonzero, it does not scale down with narrow B. Without this
    # floor the router sends banded SpMV to gather (model said 0.03 ms,
    # reality 83 ms).
    "gather_per_nnz_floor": 15e-9,
    "tiled_slot_overhead": 120e-9,
    "tiled_bw": 600e9,
    "densify_per_nnz": 9e-9,
    # dense 'high' runs the manual 3-pass bf16 decomposition, measured at
    # ~43e12 fp32-equivalent FLOP/s on the shared v5e (16384^2 x 512) —
    # NOT the 6-pass HIGHEST rate in _ROOFLINE (which would overestimate
    # dense cost ~1.3x and misroute near the dense/tiled crossover)
    "dense_fp32_flops": 43e12,
    # the one-shot spmm API re-packs CSR values into block ELL form per
    # call (~5 ns/nnz XLA scatter); plan-reuse callers should hold
    # weights in packed form and call spmm_blocks — that path pays none
    # of this
    "pack_per_nnz": 5e-9,
    # the diagonal path streams noff*(m, n) slabs; measured 0.125 ms for
    # a 5-diagonal 1M-row SpMV (60 MB of traffic) => ~480 GB/s effective
    "dia_bw": 480e9,
}
_COST = dict(_COST_DEFAULTS)


def get_cost_constants() -> dict:
    """The router cost-model constants currently in effect (a copy)."""
    _load_calibration_into_cost()
    return dict(_COST)


def set_cost_constants(**kwargs) -> dict:
    """Override router cost constants (used by tpusparse.calibrate());
    unknown keys raise. Clears the route cache so new decisions apply."""
    global _CALIBRATION_LOADED
    _CALIBRATION_LOADED = True  # an explicit override wins over the file fit
    for k_, v in kwargs.items():
        if k_ not in _COST:
            raise KeyError(
                f"unknown cost constant {k_!r}; known: {sorted(_COST)}"
            )
        _COST[k_] = float(v)
    _ROUTE_CACHE.clear()
    return dict(_COST)


_CALIBRATION_LOADED = False


def _load_calibration_into_cost(force: bool = False):
    """Apply a persisted tpusparse.calibrate() fit, if one exists.

    Lazy (first router use / get_cost_constants), NOT at import: the
    backend-match check in load_calibration needs jax's backend, and
    initializing the TPU tunnel as an import side effect would make
    `import tpusparse` slow and flaky.
    """
    global _CALIBRATION_LOADED
    if _CALIBRATION_LOADED and not force:
        return
    _CALIBRATION_LOADED = True
    from tpusparse.utils.calibrate import load_calibration

    fit = load_calibration()
    if fit:
        for k_, v in fit.items():
            if k_ in _COST:
                _COST[k_] = float(v)
        _ROUTE_CACHE.clear()


def _route_spmm(a: CSR, b: jnp.ndarray, blocksize: Optional[Tuple[int, int]]) -> str:
    """Pick the kernel for method='auto' from a host-side cost model.

    The inspector's core decision (SURVEY.md §7.3), generalized to three
    regimes: the MXU tiled executor pays per *occupied block* (a (bk, n)
    B-tile gather + a dense MXU pass each), the XLA row-gather path pays
    per *nonzero* (one random B row each), and the dense matmul pays for
    *every* block but at full MXU/HBM streaming rates. Each candidate's
    time is projected from pattern stats and the cheapest wins. Routes to
    'tiled' when the pattern is traced (no host stats).
    """
    from tpusparse.plan import _ROOFLINE
    from tpusparse.utils.config import get_config

    _load_calibration_into_cost()
    cfg = get_config()
    try:
        indptr = np.asarray(a.indptr)
        indices = np.asarray(a.indices)
    except Exception:
        # traced pattern: the plan path CANNOT run (the inspector needs
        # concrete indices); gather is the one method with a fully
        # jittable fallback (row_ids searchsorted)
        return "gather"
    m, k = a.shape
    bm, bk = blocksize or (cfg.spmm_block_m, cfg.spmm_block_k)
    n = int(b.shape[-1])
    if b.ndim == 3:
        # batched B folds into the column axis before execution — cost
        # every candidate at the width it will actually run at
        n = int(b.shape[0]) * n
    # key includes the per-element width: the fold-copy term below
    # depends on the (batch, n) SPLIT, not just the folded product
    key = (
        _fingerprint(a.shape, (bm, bk), indptr, indices),
        n,
        int(b.shape[-1]) if b.ndim == 3 else 0,
    )
    hit = _ROUTE_CACHE.get(key)
    if hit is not None:
        return hit

    per_row = np.diff(indptr)
    rows = np.repeat(np.arange(m, dtype=np.int64), per_row)
    nbc = (k + bk - 1) // bk
    nblocks = int(np.unique((rows // bm) * nbc + indices // bk).size)
    nnz = int(indices.shape[0])

    # A 3-D b that cannot take the batch-grid resident executor FOLDS
    # batch into columns — two transpose copies (B in, C out) that the
    # r4 bench decomposition measured at their HBM cost (0.65 ms for a
    # 256 MB B; bert4d's folded 1.07 GB B made the router prefer tiled
    # where dense measured 1.17x faster). Dense never folds (XLA batches
    # dot_general natively); gather folds the same way.
    from tpusparse.kernels.tiled_spmm import resident_batched_vmem_bytes
    from tpusparse.utils.config import round_up as _ru

    fold_copy_s = 0.0
    if b.ndim == 3:
        n_elem = int(b.shape[-1])
        bn_e = min(cfg.spmm_block_n, _ru(n_elem, 128))

        class _BStats:  # resident_batched_vmem_bytes reads these fields
            blocksize = (bm, bk)
            num_col_blocks = nbc
            num_row_blocks = (m + bm - 1) // bm
            # ELL padding unknown pre-plan; nblocks lower-bounds num_slots
            num_slots = nblocks

        batched_ok = (
            nblocks >= nbc
            and _ru(n_elem, 128) >= 256
            and resident_batched_vmem_bytes(_BStats, 4, bn_e)
            <= cfg.vmem_limit_bytes
        )
        if not batched_ok:
            fold_copy_s = (
                2.0 * (k * n + m * n) * 4.0 / _ROOFLINE["hbm_bandwidth"]
            )

    t_gather = (
        nnz * max(n * 8.0 / _COST["gather_row_bw"], _COST["gather_per_nnz_floor"])
        + fold_copy_s
    )
    # the tiled path upgrades to the resident executor when the B panel
    # fits VMEM AND the pattern re-uses it; B traffic is then one panel
    # (k rows) per n-tile instead of one (bk, n) tile per occupied block
    from tpusparse.kernels.tiled_spmm import resident_vmem_bytes as _rvb

    class _PlanStats:  # cheap stand-in: _rvb only reads these fields
        blocksize = (bm, bk)
        num_col_blocks = nbc
        ell_width = 0

    bn_eff = min(cfg.spmm_block_n, n)
    resident_ok = (
        nblocks >= nbc
        and _rvb(_PlanStats, n, 4, bn_eff) <= cfg.vmem_limit_bytes
    )
    b_bytes = min(nblocks * bk, k) * n if resident_ok else nblocks * bk * n
    tiled_bytes = (b_bytes + nblocks * bm * bk + m * n * 2) * 4.0
    t_tiled = (
        max(
            tiled_bytes / _COST["tiled_bw"],
            nblocks * _COST["tiled_slot_overhead"] * max(n // 512, 1),
        )
        + nnz * _COST["pack_per_nnz"]
        + fold_copy_s
    )
    t_dense = (
        max(
            2.0 * m * k * n / _COST["dense_fp32_flops"],
            (m * k + k * n + m * n) * 4.0 / _ROOFLINE["hbm_bandwidth"],
        )
        + nnz * _COST["densify_per_nnz"]
        + m * k * 4.0 / _ROOFLINE["hbm_bandwidth"]
    )
    candidates = [(t_tiled, "tiled"), (t_gather, "gather"), (t_dense, "dense")]
    # banded regime: the gather-free diagonal path streams at HBM rate;
    # the one-shot cost includes re-packing values into (noff, m) slabs
    pat = _dia_pattern(a, max_offsets=128)
    if pat is not None:
        noff = int(pat[0].size)
        t_dia = (
            noff * m * (n + 2) * 4.0 / _COST["dia_bw"] + nnz * _COST["pack_per_nnz"]
        )
        candidates.append((t_dia, "dia"))
    method = min(candidates)[1]
    _ROUTE_CACHE[key] = method
    return method


def spmm(
    a: CSR,
    b: jnp.ndarray,
    method: str = "auto",
    reduce: str = "sum",
    blocksize: Optional[Tuple[int, int]] = None,
    return_arg: bool = False,
) -> jnp.ndarray:
    """Sparse × dense matmul with method dispatch.

    methods: 'tiled' (inspector-executor Pallas, the MXU perf path;
    transparently upgrades to the resident-B executor when the panel fits
    VMEM), 'resident' (forced resident-B-panel executor), 'footprint'
    (B-tile-reuse variant — one fetch per distinct column per
    super-row-block), 'gather' (XLA take/scatter-add, the low-fill perf
    path), 'dense'
    (densify + MXU matmul, the near-full regime), 'naive' (gather Pallas
    kernel, reference-parity path with reducer modes), 'reference'
    (pure-XLA segment ops), 'auto' (inspector cost model picks
    gather/tiled/dense; reference for non-sum reducers). Batched 3-D b
    maps over the shared pattern.
    return_arg=True (reduce='min'/'max' only) also returns the int32
    argmin/argmax matrix — per output element, the global nnz index of A
    attaining the extremum, `a.nnz` for empty rows (the reference kernel's
    arg_out, naive_sparse_mm.cu:125-129 / naive_reducer.cuh:56-66) — on
    the 'auto'/'reference' (XLA segment) or 'naive' (Pallas) paths.
    Analog of sparse_matmul routing (matmuls.py:189-235) minus its quirks
    (the reference routes the 3-D cusparse path through the naive kernel,
    matmuls.py:224).
    """
    from tpusparse.types import BSR, COO, DIA, bsr_to_csr, coo_to_csr

    if return_arg and reduce not in ("min", "max"):
        raise ValueError("return_arg is only meaningful for reduce='min'/'max'")
    if isinstance(a, DIA):
        if reduce != "sum":
            raise ValueError(
                f"DIA operands support reduce='sum' only (got {reduce!r})"
            )
        return dia_spmm(a, b)
    if isinstance(a, BSR):
        # BSR carries its natural tile size — use it as the plan blocksize
        blocksize = blocksize or a.blocksize
        a = bsr_to_csr(a)
    elif isinstance(a, COO):
        a = coo_to_csr(a)  # native counting sort for concrete patterns
    from tpusparse.utils.config import get_config

    if get_config().debug_checks:
        from tpusparse.utils.debug import validate_csr

        validate_csr(a)
    if b.ndim == 1:  # SpMV: lift to one-column SpMM (reference matmuls.py:39-41
        # does the analogous 1-D fallback on the dense path)
        out = spmm(a, b[:, None], method, reduce, blocksize, return_arg)
        if return_arg:
            return out[0][..., 0], out[1][..., 0]
        return out[..., 0]
    _check_spmm_b(a, b)
    if b.ndim > 3:  # fold leading batch dims (reference folds 4-D batches
        # on the dense path, custom_mm.cpp:125-164, and loops otherwise)
        lead = b.shape[:-2]
        out = spmm(
            a, b.reshape((-1,) + b.shape[-2:]), method, reduce, blocksize,
            return_arg,
        )
        if return_arg:
            return tuple(o.reshape(lead + o.shape[-2:]) for o in out)
        return out.reshape(lead + out.shape[-2:])
    if reduce != "sum" and method in ("auto", "reference"):
        if b.ndim == 3:
            return _fold_batch(
                lambda bb: spmm_reference(
                    a, bb, reduce=reduce, return_arg=return_arg
                ),
                b,
                _gather_fold_cols(a.nnz),
            )
        return spmm_reference(a, b, reduce=reduce, return_arg=return_arg)
    if reduce != "sum" and method == "naive":
        return naive_spmm(a, b, reduce=reduce, return_arg=return_arg)
    if reduce != "sum" and method != "naive":
        # tiled/footprint/gather/dense are sum-only kernels; silently
        # returning the sum for an explicitly requested reducer would be
        # wrong values, not an approximation
        raise ValueError(
            f"method {method!r} supports reduce='sum' only (got {reduce!r}); "
            "use method='naive', 'reference', or 'auto'"
        )
    if method == "auto":
        method = _route_spmm(a, b, blocksize)
    if method == "tiled":
        return tiled_spmm(a, b, blocksize=blocksize)
    if method == "footprint":
        return footprint_spmm(a, b, blocksize=blocksize)
    if method == "resident":
        return resident_spmm(a, b, blocksize=blocksize)
    if method == "gather":
        return gather_spmm(a, b)
    if method == "dia":
        pat = _dia_pattern(a, max_offsets=128)
        if pat is None:
            raise ValueError(
                "method='dia' needs a concrete banded pattern "
                "(<= 128 distinct diagonals); use csr_to_dia/gather"
            )
        offs, slot, rows = pat
        if isinstance(a.data, jax.core.Tracer):
            # traced values: one differentiable device scatter
            ddata = (
                jnp.zeros((offs.size, a.shape[0]), a.dtype)
                .at[(jnp.asarray(slot), jnp.asarray(rows))]
                .set(a.data)
            )
        else:
            # concrete values: host fill (an eager 2-D device scatter at
            # 5M entries measured ~3 min of XLA compile+run — the same
            # split csr_to_dia makes)
            host = np.zeros(
                (offs.size, a.shape[0]), np.asarray(a.data).dtype
            )
            host[slot, rows] = np.asarray(a.data)
            ddata = jnp.asarray(host)
        return dia_spmm(DIA(data=ddata, offsets=offs, shape=a.shape), b)
    if method == "dense":
        # densify and ride the MXU — the right call when nearly every
        # block is occupied (the reference's torch.matmul fallback regime).
        # 3-D b broadcasts through one batched dot_general — XLA batches
        # dense matmuls natively, no fold or map needed
        return dense.matmul(a.to_dense(), b)
    if method == "naive":
        return naive_spmm(a, b, reduce=reduce)
    if method == "reference":
        if b.ndim == 3:
            return _fold_batch(
                lambda bb: spmm_reference(a, bb), b, _gather_fold_cols(a.nnz)
            )
        return spmm_reference(a, b)
    raise ValueError(f"unknown spmm method {method!r}")
