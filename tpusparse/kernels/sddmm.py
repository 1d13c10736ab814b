"""SDDMM — sampled dense-dense matmul restricted to a Plan's block pattern.

New capability relative to the reference (which has no SDDMM; its sparse
backward densifies the gradient and runs a full SpMM, matmuls.py:245-256).
SDDMM is the mathematically right dA gradient for C = A @ B:
dA = (dC @ Bᵀ) restricted to A's sparsity pattern — required by the
BASELINE.json north star.

Kernel: grid (num_row_blocks, ell_width, num_n_tiles); each valid ELL slot
(i, l) produces one dense (bm, bk) block = dC[i-block] @ B[cols[i,l]-block]ᵀ
accumulated over n tiles. Invalid (padded) slots write zeros so gradients
never leak into padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels import mxu
from tpusparse.plan import Plan
from tpusparse.utils.config import (
    eager_precision,
    get_config,
    interpret_mode,
    pallas_precision,
    round_up,
)


def _sddmm_kernel(
    cols_ref, nslots_ref, dc_ref, b_ref, o_ref, acc_ref, *, nt: int, precision
):
    i = pl.program_id(0)
    l = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += mxu.dot_nt(dc_ref[:], b_ref[:], precision)

    @pl.when(t == nt - 1)
    def _():
        valid = (l < nslots_ref[i]).astype(o_ref.dtype)
        o_ref[0] = acc_ref[:].astype(o_ref.dtype) * valid


@eager_precision
@functools.partial(jax.jit, static_argnames=("block_n", "precision"))
def sddmm_pallas(
    plan: Plan,
    dc: jnp.ndarray,
    b: jnp.ndarray,
    *,
    block_n: int | None = None,
    precision: str | None = None,
) -> jnp.ndarray:
    """Block-pattern-restricted dC @ Bᵀ.

    dc: (m, n) dense gradient of C; b: (k, n) dense operand.
    Returns block_vals-shaped (plan.num_slots, bm, bk) gradient blocks;
    per-nonzero CSR gradients come from plan.unpack_values(...).
    """
    m, k = plan.shape
    bm, bk = plan.blocksize
    if dc.shape[0] != m or b.shape[0] != k or dc.shape[1] != b.shape[1]:
        raise ValueError(f"sddmm shape mismatch: dc {dc.shape}, b {b.shape}, plan {plan.shape}")
    n = dc.shape[1]
    cfg = get_config()

    bn = min(block_n or cfg.spmm_block_n, round_up(n, 128))
    np_ = round_up(n, bn)
    mp = plan.num_row_blocks * bm
    kp = plan.num_col_blocks * bk
    if (mp, np_) != dc.shape:
        dc = jnp.pad(dc, ((0, mp - m), (0, np_ - n)))
    if (kp, np_) != b.shape:
        b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))

    nbr = plan.num_row_blocks
    L = plan.ell_width
    nt = np_ // bn
    grid = (nbr, L, nt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bm, bn),
                lambda i, l, t, cols, nslots: (i, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bk, bn),
                lambda i, l, t, cols, nslots: (cols[i * L + l], t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, bk),
            lambda i, l, t, cols, nslots: (i * L + l, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
    )

    return pl.pallas_call(
        functools.partial(_sddmm_kernel, nt=nt, precision=pallas_precision(precision)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_slots, bm, bk), dc.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_slots * bm * bk * np_,
            bytes_accessed=(
                nbr * bm * np_ + plan.num_slots * bk * np_ + plan.num_slots * bm * bk
            )
            * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(plan.block_cols.reshape(-1), plan.nslots, dc, b)
