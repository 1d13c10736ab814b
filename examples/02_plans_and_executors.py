"""The inspect-once / multiply-many lifecycle (the reference's TiledSpMM).

Reference (tests/tiledsppm_kernel_test.py):

    tiledspmm_inspect_coo(m, n, k, nnz, rows, cols, vals, "layer0")
    tiledspmm_mm(b, c, "layer0")        # many times
    tiledspmm_clean()

tpusparse: the plan is keyed by the PATTERN's content fingerprint, not a
name you must manage — repeated `ts.spmm` calls on the same pattern hit
the cache automatically. For jit-traced values, build the plan once and
call the executor directly.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as ssp

import tpusparse as ts
from tpusparse.plan import build_plan, plan_cache_info

rng = np.random.default_rng(0)
a_sp = ssp.random(1024, 1024, density=0.01, format="csr", random_state=2,
                  dtype=np.float32)
a_sp.sort_indices()
A = ts.CSR.from_scipy(a_sp)
B = jnp.asarray(rng.normal(size=(1024, 256)).astype(np.float32))
ref = a_sp.astype(np.float64) @ np.asarray(B, np.float64)

# implicit: every call fingerprints the pattern and reuses the plan
before = plan_cache_info()["hits"]
y1 = ts.spmm(A, B, method="tiled")
y2 = ts.spmm(A, B, method="tiled")
assert plan_cache_info()["hits"] > before
err = np.abs(np.asarray(y2, np.float64) - ref).max() / np.abs(ref).max()
assert err < 1e-4, err
print(f"  implicit plan reuse: cache hits grew; rel err {err:.2e}")

# explicit: a Plan object + packed values — the jit-friendly form
plan = build_plan(A)
print(plan.report())
packed = plan.pack_values(A.data)

@jax.jit
def multiply_many(packed, b):
    return ts.ops.spmm_blocks(plan, packed, b)

y3 = multiply_many(packed, B)
err = np.abs(np.asarray(y3, np.float64) - ref).max() / np.abs(ref).max()
assert err < 1e-4, err
print(f"  explicit plan executor under jit: rel err {err:.2e}")

# --- batched 3-D operands: batch rides the executor grid (r5) ----------------
# A shared sparse pattern applied to a BATCH of dense operands. When the
# B panel plus the packed values fit VMEM and the per-element width is
# >=256 lanes, ops dispatches the batch-grid resident executor (no
# column-fold transposes, values streamed once per launch); otherwise
# the batch folds into the column axis as one launch. Both paths are
# differentiable and the router prices them per shape.
B3 = jnp.asarray(rng.normal(size=(4, 1024, 256)).astype(np.float32))
y4 = ts.spmm(A, B3, method="tiled")
ref3 = np.einsum(
    "ij,bjk->bik", a_sp.toarray().astype(np.float64),
    np.asarray(B3, np.float64),
)
err = np.abs(np.asarray(y4, np.float64) - ref3).max() / np.abs(ref3).max()
assert err < 1e-4, err
print(f"  batched 3-D tiled spmm: rel err {err:.2e}")

print("02_plans_and_executors: OK")
