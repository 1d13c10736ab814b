"""int8 quantized serving path tests (quant.py + the int8 resident executor).

Golden-reference comparison at serving-grade tolerance (~1e-2 relative —
int8's information limit, quant.py docstring) against numpy fp64, plus the
contract guards: pad-slot scale-0, rank handling, dtype and VMEM-budget
errors. The reference has no quantized path (fp32-only, `#define T float`
src/sparse_mm.cu:12); the oracle role mirrors its dense-vs-torch testing
(tests/cusparse_kernel_test.py:58-65).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse import CSR, QuantizedMatrix
from tpusparse.kernels.tiled_spmm import (
    resident_int8_vmem_bytes,
    resident_spmm_int8_pallas,
)
from tpusparse.plan import build_plan
from tpusparse.quant import quantize_block_values, quantize_columns
from tpusparse.utils.config import set_config


def _block_csr(rng, m, k, bm, bk, fill):
    """Random block-sparse CSR with >=1 block per row-block (scipy BSR)."""
    mask = rng.random((m // bm, k // bk)) < fill
    for i in range(m // bm):
        if not mask[i].any():
            mask[i, rng.integers(0, k // bk)] = True
    rows, cols = np.nonzero(mask)
    vals = rng.standard_normal((len(rows), bm, bk)).astype(np.float32)
    indptr = np.concatenate([[0], np.cumsum(np.bincount(rows, minlength=m // bm))])
    bsr = sp.bsr_matrix((vals, cols, indptr), shape=(m, k))
    return bsr.tocsr()


def test_quantize_block_values_roundtrip(rng):
    vals = jnp.asarray(rng.standard_normal((12, 8, 16)).astype(np.float32))
    q, s = quantize_block_values(vals)
    assert q.dtype == jnp.int8 and s.shape == (12,)
    back = q.astype(jnp.float32) * s[:, None, None]
    # symmetric int8: error bounded by half an LSB of each block's scale
    err = np.abs(np.asarray(back) - np.asarray(vals))
    bound = np.asarray(s)[:, None, None] * 0.5 + 1e-8
    assert (err <= bound).all()


def test_quantize_block_values_pad_slots(rng):
    vals = np.zeros((4, 8, 8), np.float32)
    vals[1] = rng.standard_normal((8, 8))
    q, s = quantize_block_values(jnp.asarray(vals))
    # all-zero (pad) blocks get scale 0 and quantized 0 — contribute nothing
    assert float(s[0]) == 0.0 and float(s[2]) == 0.0
    assert not np.asarray(q[0]).any() and not np.asarray(q[3]).any()
    assert float(s[1]) > 0.0


def test_quantize_columns_roundtrip(rng):
    b = rng.standard_normal((64, 24)).astype(np.float32)
    b[:, 3] = 0.0  # all-zero column must not divide by zero
    q, t = quantize_columns(jnp.asarray(b))
    assert q.dtype == jnp.int8 and t.shape == (24,)
    back = np.asarray(q, np.float32) * np.asarray(t)
    assert np.abs(back - b).max() <= float(np.asarray(t).max()) * 0.5 + 1e-8
    assert not np.asarray(q[:, 3]).any()


@pytest.mark.parametrize("shape,fill", [((256, 256), 0.3), ((128, 384), 0.15)])
def test_quantized_matmul_vs_fp64(rng, shape, fill):
    m, k = shape
    a_sp = _block_csr(rng, m, k, 8, 16, fill)
    qa = QuantizedMatrix(CSR.from_scipy(a_sp), blocksize=(8, 16))
    b = rng.standard_normal((k, 48)).astype(np.float32)
    out = np.asarray(qa @ jnp.asarray(b))
    ref = a_sp.toarray().astype(np.float64) @ b.astype(np.float64)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


def test_quantized_matmul_vector_rank(rng):
    a_sp = _block_csr(rng, 64, 64, 8, 8, 0.4)
    qa = QuantizedMatrix(CSR.from_scipy(a_sp), blocksize=(8, 8))
    x = rng.standard_normal(64).astype(np.float32)
    y = qa @ jnp.asarray(x)
    assert y.shape == (64,)
    ref = a_sp.toarray().astype(np.float64) @ x.astype(np.float64)
    rel = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


def test_quantized_dequantize_error_audit(rng):
    a_sp = _block_csr(rng, 64, 64, 8, 8, 0.4)
    a = CSR.from_scipy(a_sp)
    qa = QuantizedMatrix(a, blocksize=(8, 8))
    # stored-weight error is within int8's half-LSB bound relative to
    # the max magnitude (per-block scales make it much tighter in practice)
    assert qa.quantization_error(a) < 1.0 / 127.0


def test_int8_executor_dtype_guard(rng):
    a_sp = _block_csr(rng, 64, 64, 8, 8, 0.4)
    qa = QuantizedMatrix(CSR.from_scipy(a_sp), blocksize=(8, 8))
    b_f32 = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    with pytest.raises(TypeError, match="int8"):
        resident_spmm_int8_pallas(
            qa.plan, qa.qvals.astype(jnp.float32), qa.scales,
            b_f32.astype(jnp.int8), jnp.ones((16,), jnp.float32),
        )
    with pytest.raises(TypeError, match="int8"):
        resident_spmm_int8_pallas(
            qa.plan, qa.qvals, qa.scales, b_f32, jnp.ones((16,), jnp.float32),
        )


def test_int8_executor_vmem_guard(rng):
    a_sp = _block_csr(rng, 64, 64, 8, 8, 0.4)
    a = CSR.from_scipy(a_sp)
    plan = build_plan(a, blocksize=(8, 8))
    qvals, scales = quantize_block_values(plan.pack_values(a.data))
    bq, t = quantize_columns(jnp.asarray(
        rng.standard_normal((64, 16)).astype(np.float32)))
    assert resident_int8_vmem_bytes(plan, 128) > 0
    from tpusparse.utils.config import get_config

    old_limit = get_config().vmem_limit_bytes
    set_config(vmem_limit_bytes=1024)
    try:
        with pytest.raises(ValueError, match="VMEM"):
            resident_spmm_int8_pallas(plan, qvals, scales, bq, t)
    finally:
        set_config(vmem_limit_bytes=old_limit)


def test_quantized_shape_mismatch(rng):
    a_sp = _block_csr(rng, 64, 64, 8, 8, 0.4)
    qa = QuantizedMatrix(CSR.from_scipy(a_sp), blocksize=(8, 8))
    with pytest.raises(ValueError, match="incompatible"):
        qa @ jnp.ones((32, 4), jnp.float32)


def test_int8_ring_matches_resident(rng):
    """The big-K int8 ELL ring is bitwise identical to the resident int8
    kernel on shared shapes (same slot order, same MXU pass)."""
    from tpusparse.kernels.tiled_spmm import tiled_spmm_int8_pallas

    a_sp = _block_csr(rng, 128, 256, 8, 16, 0.25)
    a = CSR.from_scipy(a_sp)
    plan = build_plan(a, blocksize=(8, 16))
    qvals, scales = quantize_block_values(plan.pack_values(a.data))
    bq, t = quantize_columns(
        jnp.asarray(rng.standard_normal((256, 48)).astype(np.float32))
    )
    out_res = np.asarray(resident_spmm_int8_pallas(plan, qvals, scales, bq, t))
    out_ring = np.asarray(tiled_spmm_int8_pallas(plan, qvals, scales, bq, t))
    np.testing.assert_array_equal(out_ring, out_res)
    ref = a_sp.toarray().astype(np.float64) @ (
        np.asarray(bq, np.float64) * np.asarray(t, np.float64)
    )
    rel = np.abs(out_ring - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


def test_quantized_matmul_big_k_dispatches_ring(rng):
    """QuantizedMatrix must not cliff when the int8 panel exceeds the VMEM
    budget: it dispatches the ELL ring and stays serving-accurate."""
    from tpusparse.utils.config import get_config

    a_sp = _block_csr(rng, 64, 512, 8, 16, 0.3)
    a = CSR.from_scipy(a_sp)
    qa = QuantizedMatrix(a, blocksize=(8, 16))
    b = rng.standard_normal((512, 32)).astype(np.float32)
    old_limit = get_config().vmem_limit_bytes
    # shrink the budget below the (512, 128) int8 panel so the resident
    # guard fails and matmul must take the ring (the former behavior was
    # an eager ValueError from resident_spmm_int8_pallas)
    set_config(vmem_limit_bytes=48 * 1024)
    try:
        out = np.asarray(qa @ jnp.asarray(b))
    finally:
        set_config(vmem_limit_bytes=old_limit)
    ref = a_sp.toarray().astype(np.float64) @ b.astype(np.float64)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


class TestDenseInt8:
    """Dense int8 serving tier (r3): gemm_int8_pallas + the QuantizedDense
    inspect-once wrapper. The s8xs8->s32 kernel is EXACT in int32, so the
    kernel test compares bitwise against numpy int32."""

    def test_int8_gemm_exact_vs_numpy(self, rng):
        from tpusparse.kernels.gemm import gemm_int8_pallas

        a = rng.integers(-127, 128, (96, 200)).astype(np.int8)
        b = rng.integers(-127, 128, (200, 160)).astype(np.int8)
        out = np.asarray(gemm_int8_pallas(jnp.asarray(a), jnp.asarray(b)))
        ref = a.astype(np.int32) @ b.astype(np.int32)
        assert (out == ref).all()

    def test_int8_gemm_rejects_float(self):
        from tpusparse.kernels.gemm import gemm_int8_pallas

        with pytest.raises(TypeError, match="int8"):
            gemm_int8_pallas(jnp.zeros((8, 8)), jnp.zeros((8, 8), jnp.int8))

    def test_quantized_matmul_error_class(self, rng):
        from tpusparse.quant import quantized_matmul

        a = rng.standard_normal((64, 256)).astype(np.float32)
        b = rng.standard_normal((256, 48)).astype(np.float32)
        out = np.asarray(quantized_matmul(jnp.asarray(a), jnp.asarray(b)))
        ref = a.astype(np.float64) @ b.astype(np.float64)
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert 1e-4 < rel < 5e-2, rel  # int8 information limit, not broken

    def test_quantized_dense_serving(self, rng):
        from tpusparse.quant import QuantizedDense

        w = rng.standard_normal((48, 128)).astype(np.float32)
        qd = QuantizedDense(jnp.asarray(w))
        x = rng.standard_normal((128, 8)).astype(np.float32)
        out = np.asarray(qd @ jnp.asarray(x))
        ref = w.astype(np.float64) @ x.astype(np.float64)
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert rel < 5e-2, rel
        v = np.asarray(qd.matmul(jnp.asarray(x[:, 0])))
        assert v.shape == (48,)
        dq_err = np.abs(np.asarray(qd.dequantize()) - w).max()
        assert dq_err < np.abs(w).max() / 100
        with pytest.raises(ValueError, match="incompatible"):
            qd.matmul(jnp.zeros((64, 3)))
