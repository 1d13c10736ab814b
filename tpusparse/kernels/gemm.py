"""Blocked dense GEMM as a Pallas TPU kernel.

TPU-native replacement for the reference's cuBLAS wrappers
(`cublas_mm_wrapper` src/baseline_mm.cu:52-102, `cublas_bmm_wrapper`
:105-155). The whole row/col-major operand-swap dance disappears: blocks
stream HBM->VMEM via the Pallas pipeline and land on the MXU directly.

Grid is (M/bm, N/bn, K/bk) with a float32 VMEM accumulator; the K axis is
innermost so the output block stays resident in VMEM across the reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels import mxu
from tpusparse.utils.config import (
    eager_precision,
    get_config,
    interpret_mode,
    pallas_precision,
    round_up,
)


def _gemm_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk: int, precision):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += mxu.dot(a_ref[:], b_ref[:], precision)

    @pl.when(pl.program_id(2) == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@eager_precision
@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "precision"),
)
def gemm_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
    out_dtype=None,
    precision: str | None = None,
) -> jnp.ndarray:
    """C = A @ B for 2-D operands, fp32 accumulation on the MXU."""
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(f"gemm_pallas is 2-D only, got {a.shape} @ {b.shape}")
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} @ {b.shape}")
    cfg = get_config()
    out_dtype = out_dtype or jnp.result_type(a.dtype, b.dtype)

    # MXU/VPU-aligned tiles: sublane multiples of 8, lane multiples of 128.
    # Size-adaptive defaults from the r2 interleaved-median sweep on v5e:
    # ≤4096-class problems run fastest with the full-N-span (1024, N, 512)
    # tile (177-214 TF, 0.90-1.02x XLA across tenancy swings); larger
    # problems with the config defaults (2048, 1024, 512) — measured XLA
    # parity at 8192² (167.0 vs 166.7 TF). Explicit block_* args override.
    # ... but only when the config tiles are also the untouched defaults —
    # a user-tuned set_config(gemm_block_*) must win over the size heuristic
    cfg_default = (cfg.gemm_block_m, cfg.gemm_block_n, cfg.gemm_block_k) == (
        type(cfg).gemm_block_m,
        type(cfg).gemm_block_n,
        type(cfg).gemm_block_k,
    )
    if block_m is None and block_n is None and block_k is None and (
        cfg_default and max(m, n, k) <= 4096
    ):
        block_m, block_n, block_k = 1024, 4096, 512
    bm = min(block_m or cfg.gemm_block_m, round_up(m, 8))
    bn = min(block_n or cfg.gemm_block_n, round_up(n, 128))
    bk = min(block_k or cfg.gemm_block_k, round_up(k, 128))

    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
    if (mp, kp) != (m, k):
        a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))

    nk = kp // bk
    grid = (mp // bm, np_ // bn, nk)

    out = pl.pallas_call(
        functools.partial(_gemm_kernel, nk=nk, precision=pallas_precision(precision)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, s: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the default scoped-vmem cap is 16MB; v5e has 128MB of VMEM and
            # large (2048, 1024) tiles with an fp32 accumulator need ~30MB;
            # >64MB measurably degrades Mosaic pipelining on the executors
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + mp * np_) * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(a, b)

    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out
