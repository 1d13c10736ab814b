"""int8 quantized-serving benchmark — QuantizedMatrix vs the fp32 resident
executor on the block-sparse headline shape.

No reference analog (the reference is fp32-only, `#define T float`
src/sparse_mm.cu:12); this measures the serving claim in quant.py: one
s8xs8->s32 MXU pass per slot vs the 3-pass bf16 fp32 mode. Follows the
reference's benchmark protocol (log file + prints, benchmarks/
random_tensor_benchmark.py:19-26) with the device timer from
tpusparse/utils/timing.py.

Run on the real chip:  python benchmarks/quant_benchmark.py [--full]
"""

from __future__ import annotations

import os
import time

import numpy as np

from common import base_parser, get_logger, log_and_print, setup_platform


def make_block_csr(m, k, bm, bk, fill, seed):
    from tpusparse.utils.matrices import block_structured_csr

    return block_structured_csr(m, k, bm, bk, fill, seed=seed)


def main():
    args = base_parser(__doc__.splitlines()[0]).parse_args()
    setup_platform(cpu=args.cpu)

    import jax
    import jax.numpy as jnp

    import tpusparse as ts
    from tpusparse.kernels.tiled_spmm import (
        resident_spmm_int8_pallas,
        resident_spmm_pallas,
    )
    from tpusparse.quant import quantize_columns
    from tpusparse.utils.timing import device_time_per_iter

    logger = get_logger(
        "quant", os.path.join(os.path.dirname(__file__), "quant_benchmark.log")
    )
    rng = np.random.default_rng(args.seed)
    log_and_print(logger, f"backend: {jax.default_backend()}")

    # correctness gate at small scale before timing the big shape
    small = make_block_csr(1024, 1024, 128, 128, 0.3, 1)
    qa = ts.QuantizedMatrix(ts.CSR.from_scipy(small))
    b = rng.standard_normal((1024, 256)).astype(np.float32)
    out = np.asarray(qa @ jnp.asarray(b))
    ref = small.toarray().astype(np.float64) @ b.astype(np.float64)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    log_and_print(logger, f"int8 rel err (1024^2, 30% blocks): {rel:.2e}")
    assert rel < 5e-2, rel

    if not args.full:
        log_and_print(logger, "quick mode done (pass --full for the headline)")
        return

    # headline: 16384^2, 10% of 128x128 blocks, x 512 (BASELINE configs grid)
    M = K = 16384
    N = 512
    big = make_block_csr(M, K, 128, 128, 0.10, 2)
    a_big = ts.CSR.from_scipy(big)
    t0 = time.time()
    qa_big = ts.QuantizedMatrix(a_big)
    log_and_print(
        logger,
        f"nnz={big.nnz}  quantize+plan time: {time.time() - t0:.1f} s",
    )
    Bj = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))

    @jax.jit
    def int8_full(b):  # per-call activation quant + kernel (serving call)
        q, t = quantize_columns(b)
        return resident_spmm_int8_pallas(
            qa_big.plan, qa_big.qvals, qa_big.scales, q, t
        )

    out8 = np.asarray(int8_full(Bj))
    ref_cols = big.astype(np.float64) @ np.asarray(Bj[:, :32], np.float64)
    rel8 = np.abs(out8[:, :32] - ref_cols).max() / np.abs(ref_cols).max()
    log_and_print(logger, f"headline int8 rel err: {rel8:.2e}")

    # the chained device timer needs shape-preserving x -> x steps
    # (M == K on the headline shape, so out chains back as the operand)
    from tpusparse.utils.timing import normalizing

    ms8 = device_time_per_iter(normalizing(int8_full), Bj) * 1e3
    log_and_print(logger, f"int8 end-to-end (quant+kernel): {ms8:.3f} ms")

    # kernel-only: activations pre-quantized (steady-state serving where
    # quant is fused upstream); the int8-zero add injects the loop-carried
    # dependency so XLA can't hoist the call out of the chained loop
    qB, tB = quantize_columns(Bj)
    qB, tB = jax.device_put(np.asarray(qB)), jax.device_put(np.asarray(tB))

    def k8_step(x):
        dep = (x[0, 0] * 0).astype(jnp.int8)
        y = resident_spmm_int8_pallas(
            qa_big.plan, qa_big.qvals, qa_big.scales, qB + dep, tB
        )
        return y / (1.0 + jnp.abs(y).max())

    msk = device_time_per_iter(k8_step, Bj) * 1e3

    # fp32 resident, matched shape (the current headline executor)
    bv = qa_big.plan.pack_values(a_big.data)
    fp = lambda b: resident_spmm_pallas(qa_big.plan, bv, b)
    msf = device_time_per_iter(normalizing(fp), Bj) * 1e3

    log_and_print(
        logger,
        f"fp32 resident: {msf:.3f} ms | int8 kernel-only: {msk:.3f} ms "
        f"({msf / msk:.2f}x) | int8 end-to-end: {ms8:.3f} ms "
        f"({msf / ms8:.2f}x)",
    )


if __name__ == "__main__":
    main()
