"""Naive gather-based SpMM — Pallas TPU kernel, the always-correct fallback.

TPU-native analog of the reference's warp-per-row CSR kernel
(`spmm_kernel`, src/naive_sparse_mm.cu:25-101) and its reduction functor
library (src/naive_reducer.cuh:23-102: SUM/MEAN/MUL/DIV/MIN/MAX).

Redesign: instead of warps shuffling (col, val) pairs, the pattern is
ELL-packed on the host (fixed width = max row nnz) and both index and
value streams ride scalar prefetch into SMEM; each grid cell owns a
(row_tile, n_tile) output block and streams per-row dynamic slices of the
VMEM-resident B tile on the VPU. The tiled plan kernel
(tpusparse/kernels/tiled_spmm.py) is the MXU performance path; this one
exists for parity, very sparse/skewed patterns, and reduction modes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.types import CSR
from tpusparse.utils.config import get_config, interpret_mode, round_up

REDUCTIONS = ("sum", "mean", "max", "min", "mul", "div")

_ROW_TILE = 8  # rows per grid cell (fp32 sublane count)


def ell_pack(a: CSR, width: Optional[int] = None):
    """Host-side ELL packing of a CSR matrix (pattern-dependent width).

    Returns (col_idx (m, L) int32, vals (m, L), nnz_per_row (m,) int32).
    Padded slots point at column 0 with value 0.
    """
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    m = a.shape[0]
    per_row = np.diff(indptr)
    L = int(width or max(per_row.max(initial=0), 1))
    if per_row.max(initial=0) > L:
        raise ValueError(f"ell width {L} < max row nnz {per_row.max()}")
    rows = np.repeat(np.arange(m), per_row)
    pos = np.arange(indices.shape[0]) - np.repeat(indptr[:-1], per_row)
    col_idx = np.zeros((m, L), dtype=np.int32)
    col_idx[rows, pos] = indices
    valpos = (rows * L + pos).astype(np.int32)
    vals = jnp.zeros((m * L,), dtype=a.dtype).at[valpos].set(a.data).reshape(m, L)
    return jnp.asarray(col_idx), vals, jnp.asarray(per_row.astype(np.int32))


def _identity(reduce: str):
    return {
        "sum": 0.0,
        "mean": 0.0,
        "max": -jnp.inf,
        "min": jnp.inf,
        "mul": 1.0,
        "div": 1.0,
    }[reduce]


def _naive_kernel(
    idx_ref,
    vals_ref,
    nnzrow_ref,
    *refs,  # [base_ref iff return_arg], b_ref, o_ref, [arg_ref iff return_arg]
    ell_width: int,
    row_tile: int,
    reduce: str,
    return_arg: bool = False,
    nnz_fill: int = 0,
):
    if return_arg:
        # base_ref (m,) int32: row -> first global nnz index (indptr[:-1]);
        # prefetched only when the arg output is requested (SMEM budget)
        base_ref, b_ref, o_ref, arg_ref = refs
    else:
        b_ref, o_ref = refs
    i = pl.program_id(0)
    tn = o_ref.shape[1]

    for r in range(row_tile):  # static unroll over the row tile
        row = i * row_tile + r
        count = nnzrow_ref[row]
        base = base_ref[row] if return_arg else 0

        def body(l, carry):
            acc = carry[0] if return_arg else carry
            col = idx_ref[row * ell_width + l]
            v = vals_ref[row * ell_width + l]
            contrib = v * b_ref[pl.ds(col, 1), :]
            if return_arg:
                # strict improvement keeps the FIRST nnz attaining the
                # extremum (ties never update), matching spmm_reference's
                # segment_min-over-candidates tie-break
                arg = carry[1]
                better = contrib > acc if reduce == "max" else contrib < acc
                return (
                    jnp.where(better, contrib, acc),
                    jnp.where(better, base + l, arg),
                )
            if reduce in ("sum", "mean"):
                return acc + contrib
            if reduce == "max":
                return jnp.maximum(acc, contrib)
            if reduce == "min":
                return jnp.minimum(acc, contrib)
            if reduce == "div":
                return acc / contrib  # running division from 1 (reference
                # Reducer::update DIV, naive_reducer.cuh:78-79)
            return acc * contrib  # mul

        init = jnp.full((1, tn), _identity(reduce), dtype=jnp.float32)
        if return_arg:
            # arg init = nnz: the reference's empty-row fill
            # (naive_sparse_mm.cu:125-129 arg_out contract)
            init = (init, jnp.full((1, tn), nnz_fill, dtype=jnp.int32))
        out = jax.lax.fori_loop(0, count, body, init)
        acc, arg = out if return_arg else (out, None)
        if reduce == "mean":
            acc = acc / jnp.maximum(count, 1).astype(jnp.float32)
        if reduce in ("max", "min"):
            # empty rows write 0, not the ±inf loop identity — the
            # reference Reducer::write count==0 contract
            # (naive_reducer.cuh:94-99), matching spmm_reference
            acc = jnp.where(count > 0, acc, 0.0)
        o_ref[pl.ds(r, 1), :] = acc.astype(o_ref.dtype)
        if return_arg:
            arg_ref[pl.ds(r, 1), :] = arg


@functools.partial(
    jax.jit,
    static_argnames=("shape", "reduce", "block_n", "return_arg", "nnz"),
)
def naive_spmm_pallas(
    ell: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    shape: Tuple[int, int],
    b: jnp.ndarray,
    *,
    reduce: str = "sum",
    block_n: int = 512,
    return_arg: bool = False,
    nnz: int = 0,
) -> jnp.ndarray:
    """C[i,:] = reduce_{j in row i} A[i,j] * B[j,:] for ELL-packed A.

    With return_arg=True (min/max only) also returns the int32
    argmin/argmax matrix: the global nnz index attaining each extremum,
    `nnz` for empty rows — the reference arg_out contract
    (src/naive_sparse_mm.cu:125-129, naive_reducer.cuh:56-66).
    """
    if reduce not in REDUCTIONS:
        raise ValueError(f"unknown reduce {reduce!r}; options {REDUCTIONS}")
    if return_arg and reduce not in ("min", "max"):
        raise ValueError("return_arg is only meaningful for min/max")
    col_idx, vals, nnz_per_row = ell
    m, k = shape
    if b.ndim != 2 or b.shape[0] != k:
        raise ValueError(f"b shape {b.shape} incompatible with A {shape}")
    n = b.shape[1]
    L = int(col_idx.shape[1])

    # the ELL index/value/count streams ride scalar prefetch into SMEM,
    # whose budget is ~1MB — fail with guidance instead of Mosaic's OOM.
    # Streams (padded row count mp): idx mp*L, vals mp*L, nnz_per_row mp,
    # plus row_base mp iff return_arg.
    mp = round_up(m, _ROW_TILE)
    smem_bytes = (2 * mp * L + mp * (2 if return_arg else 1)) * 4
    if smem_bytes > 900_000 and not interpret_mode():
        raise ValueError(
            f"naive SpMM ELL arrays need ~{smem_bytes >> 10} KiB of SMEM "
            f"(m={m}, ell_width={L}; budget ~900 KiB) — use method='gather' "
            "or the tiled executor for patterns this large"
        )

    bn = min(block_n, round_up(n, 128))
    np_ = round_up(n, bn)
    kp = round_up(k, 8)
    if (kp, np_) != b.shape:
        b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))
    if mp != m:
        col_idx = jnp.pad(col_idx, ((0, mp - m), (0, 0)))
        vals = jnp.pad(vals, ((0, mp - m), (0, 0)))
        nnz_per_row = jnp.pad(nnz_per_row, (0, mp - m))
    prefetch = [
        col_idx.reshape(-1),
        vals.reshape(-1).astype(jnp.float32),
        nnz_per_row.astype(jnp.int32),
    ]
    if return_arg:
        # row -> first global nnz index (exclusive prefix over row counts;
        # ELL packs in CSR order, so slot (row, l) is nnz index base[row]+l).
        # Only built/prefetched when the arg output is requested — it is an
        # extra (mp,) SMEM stream the plain kernel never reads.
        prefetch.append(
            jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(nnz_per_row.astype(jnp.int32))[:-1]]
            )
        )
    # the arg empty-row fill is the matrix's nnz — static (the operands
    # are tracers under this function's jit, so it must come in as a
    # static arg, not be computed from nnz_per_row here)

    grid = (mp // _ROW_TILE, np_ // bn)

    out_shape = jax.ShapeDtypeStruct((mp, np_), jnp.float32)
    out_spec = pl.BlockSpec(
        (_ROW_TILE, bn), lambda i, j, *refs: (i, j), memory_space=pltpu.VMEM
    )
    if return_arg:
        out_shape = (out_shape, jax.ShapeDtypeStruct((mp, np_), jnp.int32))
        out_spec = (out_spec, out_spec)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (kp, bn), lambda i, j, *refs: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_spec,
    )

    out = pl.pallas_call(
        functools.partial(
            _naive_kernel,
            ell_width=L,
            row_tile=_ROW_TILE,
            reduce=reduce,
            return_arg=return_arg,
            nnz_fill=nnz,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the B column strip (kp, bn) is VMEM-resident across the whole
            # grid; at k=16384, bn=256 that is 16MB — above the 16MB default
            # scoped-vmem cap once double buffering is counted
            vmem_limit_bytes=get_config().vmem_limit_bytes,
        ),
        interpret=interpret_mode(),
    )(*prefetch, b.astype(jnp.float32))
    if return_arg:
        vals_out, arg = out
        return vals_out[:m, :n], arg[:m, :n]
    return out[:m, :n]
