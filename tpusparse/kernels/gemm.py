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
    """C = A @ B for 2-D operands, fp32 accumulation on the MXU.

    Tile resolution (EAGER — outside the jit boundary, so tuning and
    config changes are never frozen into a stale trace, the
    eager_precision rule): explicit block_* args > user-tuned
    set_config(gemm_block_*) > persisted autotuned tile for this exact
    (m, k, n, dtype) (`autotune_gemm`, ~/.tpusparse/calibration.json) >
    size heuristic from the r3 interleaved-median sweeps on v5e:
    ≤4096-class problems run fastest with (512, N-span, 512) (209 TF at
    4096² bf16 vs 190 for r2's (1024, N, 512)); larger problems with
    (2048, 2048, 512) — measured 190 TF = 1.10x XLA at 8192² bf16.
    """
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(f"gemm_pallas is 2-D only, got {a.shape} @ {b.shape}")
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} @ {b.shape}")
    cfg = get_config()
    cfg_default = (cfg.gemm_block_m, cfg.gemm_block_n, cfg.gemm_block_k) == (
        type(cfg).gemm_block_m,
        type(cfg).gemm_block_n,
        type(cfg).gemm_block_k,
    )
    if block_m is None and block_n is None and block_k is None and cfg_default:
        tuned = _tuned_tile(m, k, n, jnp.dtype(a.dtype).name)
        if tuned is not None:
            block_m, block_n, block_k = tuned
        elif max(m, n, k) <= 4096:
            block_m, block_n, block_k = 512, 4096, 512
        else:
            block_m, block_n, block_k = 2048, 2048, 512
    return _gemm_pallas_jit(
        a,
        b,
        block_m=block_m or cfg.gemm_block_m,
        block_n=block_n or cfg.gemm_block_n,
        block_k=block_k or cfg.gemm_block_k,
        out_dtype=out_dtype,
        precision=precision,
    )


@eager_precision
@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "precision"),
)
def _gemm_pallas_jit(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    block_m: int,
    block_n: int,
    block_k: int,
    out_dtype=None,
    precision: str | None = None,
) -> jnp.ndarray:
    m, k = a.shape
    _, n = b.shape
    cfg = get_config()
    out_dtype = out_dtype or jnp.result_type(a.dtype, b.dtype)

    # MXU/VPU-aligned tiles: sublane multiples of 8, lane multiples of 128
    bm = min(block_m, round_up(m, 8))
    bn = min(block_n, round_up(n, 128))
    bk = min(block_k, round_up(k, 128))

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


# -----------------------------------------------------------------------------
# Autotuner — a short on-chip sweep over a curated tile set, persisted per
# (m, k, n, dtype) next to the router calibration
# (~/.tpusparse/calibration.json, backend/device-kind guarded). The analog
# of the reference inspector's offline tuning pass (SURVEY.md §7.3) for the
# dense kernel: the decision procedure is fixed, the machine constants are
# measured locally.
# -----------------------------------------------------------------------------

_TILE_CACHE: dict = {}
_TILE_CACHE_LOADED = False


def _tile_key(m: int, k: int, n: int, dtype_name: str) -> str:
    return f"{m}x{k}x{n}x{dtype_name}"


def _tuned_tile(m: int, k: int, n: int, dtype_name: str):
    global _TILE_CACHE_LOADED
    if not _TILE_CACHE_LOADED:
        from tpusparse.utils.calibrate import load_gemm_tiles

        _TILE_CACHE.update(load_gemm_tiles())
        _TILE_CACHE_LOADED = True
    hit = _TILE_CACHE.get(_tile_key(m, k, n, dtype_name))
    return tuple(hit) if hit else None


def _tile_candidates(m: int, k: int, n: int):
    """Curated candidate tiles (r3 sweep): full-N-span with small bm for
    ≤4096-class, square-ish 2048 tiles for larger, plus the neighbors
    that won at least one shape/session."""
    cands = [
        (512, 4096, 512),
        (512, 4096, 256),
        (1024, 4096, 512),
        (256, 4096, 512),
        (2048, 2048, 512),
        (1024, 2048, 512),
        (2048, 1024, 512),
        (512, 2048, 512),
        (1024, 4096, 1024),
    ]
    out = []
    for bm, bn, bk in cands:
        t = (min(bm, round_up(m, 8)), min(bn, round_up(n, 128)),
             min(bk, round_up(k, 128)))
        if t not in out:
            out.append(t)
    return out


def autotune_gemm(
    m: int,
    k: int,
    n: int,
    dtype=jnp.bfloat16,
    *,
    repeats: int = 2,
    save: bool = True,
    verbose: bool = True,
):
    """Measure the curated tile candidates for (m, k, n, dtype) on the
    local chip and persist the winner; subsequent `gemm_pallas` calls at
    this exact shape pick it up automatically (resolved eagerly, so
    already-running processes see it on their next call too).

    ~8 candidates x (compile + chained timing) — roughly a minute per
    shape on a v5e behind the tunnel. Raises on CPU (interpret-mode
    times would be meaningless). Returns (tile, tflops).
    """
    from tpusparse.utils.timing import device_time_per_iter

    if jax.default_backend() == "cpu":
        raise RuntimeError("autotune_gemm must run on the real TPU backend")
    import numpy as np

    rng = np.random.default_rng(0)
    a = jnp.asarray(
        rng.standard_normal((m, k)).astype(np.float32)
    ).astype(dtype)
    bmat = jnp.asarray(
        rng.standard_normal((k, n)).astype(np.float32)
    ).astype(dtype)

    flops = 2.0 * m * n * k
    best, best_t = None, float("inf")
    for tile in _tile_candidates(m, k, n):
        bm, bn, bk = tile

        # time with the standard chained device timer; thread the LHS so
        # each iteration depends on the previous (0*max is unfoldable)
        def chained(x, bm=bm, bn=bn, bk=bk):
            y = gemm_pallas(x, bmat, block_m=bm, block_n=bn, block_k=bk)
            s = jnp.abs(y).max().astype(x.dtype)
            return x * (1.0 + 0.0 * s)

        try:
            ts = [
                device_time_per_iter(chained, a, iters_lo=2, iters_hi=6)
                for _ in range(repeats)
            ]
        except Exception as e:  # Mosaic reject / VMEM overflow: skip tile
            if verbose:
                print(f"[autotune] {tile}: failed ({str(e)[:80]})", flush=True)
            continue
        t = float(np.median(ts))
        if verbose:
            print(f"[autotune] {tile}: {flops / t / 1e12:.1f} TFLOP/s", flush=True)
        if t < best_t:
            best, best_t = tile, t
    if best is None:
        raise RuntimeError("autotune_gemm: every candidate failed to compile")
    key = _tile_key(m, k, n, jnp.dtype(dtype).name)
    _TILE_CACHE[key] = list(best)
    if save:
        from tpusparse.utils.calibrate import save_gemm_tile

        save_gemm_tile(key, best)
    if verbose:
        print(
            f"[autotune] best {best} = {flops / best_t / 1e12:.1f} TFLOP/s",
            flush=True,
        )
    return best, flops / best_t / 1e12


# -----------------------------------------------------------------------------
# int8 GEMM — the dense serving tier (reference analog: none; completes the
# framework's precision ladder fp32-3pass / bf16 / int8 across dense AND
# sparse). s8 x s8 -> s32 runs the MXU at 2x the bf16 rate on v5e
# (394 TOPS peak); scales are applied by the caller (quant.quantized_matmul
# fuses the rank-1 rescale into one XLA pass over the int32 result).
# -----------------------------------------------------------------------------


def _gemm_s8_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(pl.program_id(2) == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k")
)
def gemm_int8_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
) -> jnp.ndarray:
    """C = A @ B for int8 operands with exact int32 accumulation.

    Returns int32 — the caller owns dequantization (a rank-1 rescale for
    per-row/per-column scale vectors). int8 tiles carry half the bytes of
    bf16, so block_k doubles relative to the bf16 defaults.
    """
    if a.dtype != jnp.int8 or b.dtype != jnp.int8:
        raise TypeError(f"gemm_int8_pallas needs int8 operands, got "
                        f"{a.dtype}/{b.dtype}")
    if a.ndim != 2 or b.ndim != 2 or a.shape[1] != b.shape[0]:
        raise ValueError(f"bad shapes: {a.shape} @ {b.shape}")
    m, k = a.shape
    _, n = b.shape
    cfg = get_config()
    if block_m is None and block_n is None and block_k is None:
        if max(m, n, k) <= 4096:
            block_m, block_n, block_k = 512, 4096, 1024
        else:
            block_m, block_n, block_k = 2048, 2048, 1024
    bm = min(block_m or 512, round_up(m, 32))
    bn = min(block_n or 2048, round_up(n, 128))
    bk = min(block_k or 1024, round_up(k, 128))

    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
    if (mp, kp) != (m, k):
        a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))
    nk = kp // bk

    out = pl.pallas_call(
        functools.partial(_gemm_s8_kernel, nk=nk),
        grid=(mp // bm, np_ // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(a, b)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out
