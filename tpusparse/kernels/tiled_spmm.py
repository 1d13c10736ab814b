"""Tiled SpMM executor — Pallas TPU kernel driven by an inspector Plan.

TPU-native analog of `kernel_TiledELL` (reference src/sparse_mm.cu:39-99):
where the reference stages B tiles into 96KB shared memory and streams
warp-interleaved ELL slices, here the Pallas pipeline streams (block_k, n)
tiles of B into VMEM — the gather of "which B row-block does this slot
need" is driven by scalar-prefetched plan indices (PrefetchScalarGridSpec),
and each slot is one dense (block_m, block_k) x (block_k, block_n) MXU
matmul.

Grid: (num_row_blocks, num_n_tiles, ell_width), ELL axis innermost so the
output block stays resident in VMEM across the reduction. Padded ELL slots
repeat the previous block index (no new DMA) and skip compute via
`@pl.when(l < nslots[i])`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.plan import Plan
from tpusparse.utils.config import (
    get_config,
    interpret_mode,
    matmul_precision,
    round_up,
)


def _tiled_spmm_kernel(
    cols_ref, nslots_ref, vals_ref, b_ref, o_ref, acc_ref, *, ell_width: int, precision
):
    i = pl.program_id(0)
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(l < nslots_ref[i])
    def _():
        acc_ref[:] += jnp.dot(
            vals_ref[0],
            b_ref[:],
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    @pl.when(l == ell_width - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype", "precision"))
def tiled_spmm_pallas(
    plan: Plan,
    block_vals: jnp.ndarray,
    b: jnp.ndarray,
    *,
    block_n: int | None = None,
    out_dtype=None,
    precision: str | None = None,
) -> jnp.ndarray:
    """C = A @ B where A is described by (plan, block_vals).

    block_vals: (plan.num_slots, bm, bk) from plan.pack_values(csr.data).
    b: (k, n) dense. Returns (m, n).
    """
    m, k = plan.shape
    bm, bk = plan.blocksize
    if b.ndim != 2 or b.shape[0] != k:
        raise ValueError(f"b shape {b.shape} incompatible with plan k={k}")
    n = b.shape[1]
    cfg = get_config()
    out_dtype = out_dtype or jnp.result_type(block_vals.dtype, b.dtype)

    bn = min(block_n or cfg.spmm_block_n, round_up(n, 128))
    kp = plan.num_col_blocks * bk
    np_ = round_up(n, bn)
    if (kp, np_) != b.shape:
        b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))

    nbr = plan.num_row_blocks
    L = plan.ell_width
    grid = (nbr, np_ // bn, L)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bm, bk),
                lambda i, j, l, cols, nslots: (i * L + l, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bk, bn),
                lambda i, j, l, cols, nslots: (cols[i * L + l], j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn),
            lambda i, j, l, cols, nslots: (i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(
            _tiled_spmm_kernel, ell_width=L, precision=matmul_precision(precision)
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bm, np_), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_slots * bm * bk * np_,
            bytes_accessed=(
                plan.num_slots * bm * bk + plan.num_slots * bk * np_ + nbr * bm * np_
            )
            * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(plan.block_cols.reshape(-1), plan.nslots, block_vals, b)

    return out[:m, :n]
