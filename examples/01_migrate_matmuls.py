"""Migrating the reference's core matmul workflows (README.md:16-58).

Reference (torch + CUDA extension):

    init_cublas()                      # global handle
    a = torch.rand(8, 64).cuda()
    b = torch.rand(64, 8).cuda()
    c = cublasMM.apply(a, b)           # autograd-capable matmul
    destroy_cublas()

tpusparse: no handles, no device moves; ops are differentiable
functions. This script runs each reference workflow and checks it
against a host fp64 oracle.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

import tpusparse as ts

rng = np.random.default_rng(0)


def check(name, got, ref, tol=1e-4):
    err = np.abs(np.asarray(got, np.float64) - ref).max() / max(
        np.abs(ref).max(), 1e-30
    )
    assert err < tol, (name, err)
    print(f"  {name:34s} rel err {err:.2e}")


# --- dense matmul with autograd (reference: cublasMM.apply) ---
a = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
b = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
c = ts.mm(a, b)
check("ts.mm (cublasMM)", c, np.asarray(a, np.float64) @ np.asarray(b, np.float64))

# gradients: no InplaceFunction — just jax.grad
da = jax.grad(lambda x: ts.mm(x, b).sum())(a)
check("grad dA = dC @ B^T", da, np.ones((8, 8)) @ np.asarray(b, np.float64).T)

# --- transposed variants (reference: cublasTransbMM etc.) ---
q = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
check(
    "ts.transb_mm (cublasTransbMM)",
    ts.transb_mm(q, k),
    np.asarray(q, np.float64) @ np.asarray(k, np.float64).T,
)

# --- batched 4-D matmul (reference: cublas_bmm with dim folding) ---
x4 = jnp.asarray(rng.normal(size=(4, 3, 32, 16)).astype(np.float32))
y4 = jnp.asarray(rng.normal(size=(4, 3, 16, 8)).astype(np.float32))
check(
    "ts.bmm 4-D (cublas_bmm)",
    ts.bmm(x4, y4),
    np.asarray(x4, np.float64) @ np.asarray(y4, np.float64),
)

# --- sparse x dense with autograd (reference: cusparseMM/naiveSpMM) ---
import scipy.sparse as ssp

a_sp = ssp.random(512, 512, density=0.02, format="csr", random_state=1,
                  dtype=np.float32)
a_sp.sort_indices()
A = ts.CSR.from_scipy(a_sp)      # one-time boundary conversion
B = jnp.asarray(rng.normal(size=(512, 128)).astype(np.float32))
ref = a_sp.astype(np.float64) @ np.asarray(B, np.float64)
check("ts.spmm auto-routed (cusparseMM)", ts.spmm(A, B), ref)
check("ts.spmm method='naive' (naiveSpMM)", ts.spmm(A, B, method="naive"), ref)

# sparse gradients: dA comes back SDDMM-restricted to A's pattern
def loss(data):
    return ts.spmm(ts.CSR(data, A.indices, A.indptr, A.shape), B).sum()

dA = jax.grad(loss)(A.data)
check("grad dA (pattern-restricted)", dA,
      np.asarray(B, np.float64).sum(1)[np.asarray(A.indices)])

print("01_migrate_matmuls: OK")
