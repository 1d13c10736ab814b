import numpy as np, jax, jax.numpy as jnp, time
import tpusparse as ts
from tpusparse.utils.timing import device_time_per_iter
from tpusparse.plan import build_plan
from tpusparse.types import CSR

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

# small correctness first: 1024 x 1024, 128-blocks, x 256
def make_block_csr(m, k, bm, bk, fill, seed):
    r = np.random.default_rng(seed)
    mask = r.random((m//bm, k//bk)) < fill
    # ensure at least one block per row-block
    for i in range(m//bm):
        if not mask[i].any():
            mask[i, r.integers(0, k//bk)] = True
    import scipy.sparse as sp
    blocks = []
    rows, cols = np.nonzero(mask)
    dense_vals = r.standard_normal((len(rows), bm, bk)).astype(np.float32)
    data = dense_vals.reshape(len(rows), -1)
    # build CSR via BSR
    bsr = sp.bsr_matrix((dense_vals, cols, np.concatenate([[0], np.cumsum(np.bincount(rows, minlength=m//bm))])), shape=(m, k))
    return bsr.tocsr()

import scipy.sparse as sp
small = make_block_csr(1024, 1024, 128, 128, 0.3, 1)
a_small = ts.CSR.from_scipy(small)
qa = ts.QuantizedMatrix(a_small)
b = rng.standard_normal((1024, 256)).astype(np.float32)
out = np.asarray(qa @ jnp.asarray(b))
ref = small.toarray().astype(np.float64) @ b.astype(np.float64)
rel = np.abs(out - ref).max() / np.abs(ref).max()
print("TPU int8 rel err (1024):", rel, flush=True)
assert rel < 0.05

# headline shape: 16384^2, 10% of 128x128 blocks, x 512
M = K = 16384; N = 512
big = make_block_csr(M, K, 128, 128, 0.10, 2)
a_big = ts.CSR.from_scipy(big)
print("nnz:", big.nnz, flush=True)
t0 = time.time()
qa_big = ts.QuantizedMatrix(a_big)
print("quantize+plan time:", time.time() - t0, flush=True)
B = rng.standard_normal((K, N)).astype(np.float32)
Bj = jnp.asarray(B)

# int8 path: quantize activations + kernel, measured end-to-end under jit
from tpusparse.quant import quantize_columns
from tpusparse.kernels.tiled_spmm import resident_spmm_int8_pallas

@jax.jit
def int8_full(b):
    q, t = quantize_columns(b)
    return resident_spmm_int8_pallas(qa_big.plan, qa_big.qvals, qa_big.scales, q, t)

out8 = np.asarray(int8_full(Bj))
# accuracy vs fp64 on a sample of columns
ref_cols = big.astype(np.float64) @ B[:, :32].astype(np.float64)
rel8 = np.abs(out8[:, :32] - ref_cols).max() / np.abs(ref_cols).max()
print("headline int8 rel err:", rel8, flush=True)

ms8 = device_time_per_iter(lambda: int8_full(Bj)) * 1e3
print(f"int8 end-to-end: {ms8:.3f} ms", flush=True)

# fp32 resident for comparison (the current headline)
bv = qa_big.plan.pack_values(a_big.data)
from tpusparse.kernels.tiled_spmm import resident_spmm_pallas
fp = jax.jit(lambda b: resident_spmm_pallas(qa_big.plan, bv, b))
_ = fp(Bj)
msf = device_time_per_iter(lambda: fp(Bj)) * 1e3
print(f"fp32 resident: {msf:.3f} ms  -> int8 speedup {msf/ms8:.2f}x", flush=True)

# kernel-only int8 (activations pre-quantized — the serving steady state
# when the previous layer also emits int8 or quant is fused upstream)
qB, tB = quantize_columns(Bj)
qB = jax.device_put(np.asarray(qB)); tB = jax.device_put(np.asarray(tB))
k8 = jax.jit(lambda q, t: resident_spmm_int8_pallas(qa_big.plan, qa_big.qvals, qa_big.scales, q, t))
_ = k8(qB, tB)
msk = device_time_per_iter(lambda: k8(qB, tB)) * 1e3
print(f"int8 kernel-only: {msk:.3f} ms -> {msf/msk:.2f}x vs fp32 resident", flush=True)
print("DONE", flush=True)
