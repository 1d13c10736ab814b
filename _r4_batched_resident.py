"""Scratch: does the block-sparse batched fold reach its roofline when the
folded B panel fits VMEM (resident executor)? batch 8 -> panel (2048,
4096) fp32 = 33.5 MB < 64 MB limit, vs the committed batch-32 row whose
134 MB panel forces the ELL ring (6.6x above bound)."""
import numpy as np
import jax
import jax.numpy as jnp

import tpusparse as ts
from tpusparse.dense import matmul as dm
from tpusparse.ops import _route_spmm
from tpusparse.plan import _ROOFLINE
from tpusparse.utils.timing import device_time_per_iter

rng = np.random.default_rng(21)


def block_sparse_csr(seed, shape, bshape, occupancy):
    rng = np.random.default_rng(seed)
    m, k = shape
    bm, bk = bshape
    nbr = m // bm
    mask = rng.random((nbr, k // bk)) < occupancy
    blocks_per_row = mask.sum(axis=1).astype(np.int64)
    bstart = np.zeros(nbr + 1, dtype=np.int64)
    np.cumsum(blocks_per_row, out=bstart[1:])
    brows, bcols = np.nonzero(mask)
    col_base = (bcols * bk).astype(np.int64)
    runs_per_dense_row = np.repeat(blocks_per_row, bm)
    total_runs = int(runs_per_dense_row.sum())
    run_row = np.repeat(np.arange(m, dtype=np.int64), runs_per_dense_row)
    row_first_run = np.cumsum(runs_per_dense_row) - runs_per_dense_row
    pos_in_row = (
        np.arange(total_runs, dtype=np.int64)
        - np.repeat(row_first_run, runs_per_dense_row)
    )
    slot = bstart[run_row // bm] + pos_in_row
    indices = (
        col_base[slot][:, None] + np.arange(bk, dtype=np.int64)[None, :]
    ).reshape(-1)
    indptr = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(runs_per_dense_row * bk, out=indptr[1:])
    data = np.random.default_rng(seed + 1).random(total_runs * bk).astype(np.float32)
    return ts.CSR(
        data=jnp.asarray(data), indices=jnp.asarray(indices.astype(np.int32)),
        indptr=jnp.asarray(indptr.astype(np.int32)), shape=shape,
    )


a = block_sparse_csr(21, (2048, 2048), (128, 128), 0.10)
ad = a.to_dense()
hbm = _ROOFLINE["hbm_bandwidth"]

for batch in (8, 32):
    b3 = jax.random.uniform(jax.random.PRNGKey(22), (batch, 2048, 512))

    def fold_step(x):
        y = ts.spmm(a, x, method="tiled")
        return y / (1.0 + jnp.abs(y).max())

    def dense_step(x):
        y = dm(ad, x)
        return y / (1.0 + jnp.abs(y).max())

    tf_ = device_time_per_iter(fold_step, b3, iters_lo=2, iters_hi=6)
    td = device_time_per_iter(dense_step, b3, iters_lo=2, iters_hi=6)
    bound = 2.0 * b3.size * 4 / hbm
    out = np.asarray(ts.spmm(a, b3, method="tiled"))
    ref = np.asarray(jnp.matmul(ad, b3, precision=jax.lax.Precision.HIGHEST))
    rel = float(np.abs(out - ref).max() / np.abs(ref).max())
    print(
        f"batch={batch}: fold {tf_*1e3:.3f} ms dense {td*1e3:.3f} ms "
        f"speedup {td/tf_:.2f} bound {bound*1e3:.3f} ms "
        f"fold/bound {tf_/bound:.2f} rel {rel:.1e} "
        f"routed={_route_spmm(a, b3, None)}"
    )
print("DONE")
