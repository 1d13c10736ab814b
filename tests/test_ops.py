"""Autograd tests for the public op surface — the coverage the reference
lacks entirely (its backward passes are only exercised implicitly by the
MNIST benchmark; no gradcheck anywhere, SURVEY.md §4).

Uses jax.test_util.check_grads-style VJP checks against numeric diffs and
analytic formulas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from tpusparse import CSR, ops, random_csr, spmm_reference
from tpusparse.plan import build_plan, build_plan_pair

jax.config.update("jax_enable_x64", False)

GRAD_KW = dict(order=1, modes=["rev"], atol=5e-3, rtol=5e-3, eps=1e-3)


@pytest.mark.parametrize(
    "op,a_shape,b_shape",
    [
        (ops.mm, (8, 16), (16, 12)),
        (ops.transa_mm, (16, 8), (16, 12)),
        (ops.transb_mm, (8, 16), (12, 16)),
        (ops.transab_mm, (16, 8), (12, 16)),
        (ops.mm, (3, 8, 16), (3, 16, 12)),
        (ops.transb_mm, (2, 3, 8, 16), (2, 3, 12, 16)),
    ],
)
def test_dense_op_grads(rng, op, a_shape, b_shape):
    a = jnp.asarray(rng.random(a_shape, dtype=np.float32))
    b = jnp.asarray(rng.random(b_shape, dtype=np.float32))
    check_grads(op, (a, b), **GRAD_KW)


@pytest.mark.parametrize(
    "op,transa,transb",
    [
        (ops.mm, False, False),
        (ops.transa_mm, True, False),
        (ops.transb_mm, False, True),
        (ops.transab_mm, True, True),
    ],
)
def test_dense_op_values(rng, op, transa, transb):
    a = rng.random((8, 16) if not transa else (16, 8), dtype=np.float32)
    b = rng.random((16, 12) if not transb else (12, 16), dtype=np.float32)
    out = op(jnp.asarray(a), jnp.asarray(b))
    ea = a.T if transa else a
    eb = b.T if transb else b
    np.testing.assert_allclose(np.asarray(out), ea @ eb, rtol=1e-5, atol=1e-5)


def test_tiled_spmm_grads(rng):
    a = random_csr(0, (48, 64), 0.1)
    b = jnp.asarray(rng.random((64, 24), dtype=np.float32))
    plans = build_plan_pair(a, blocksize=(8, 16))

    def f(data, b):
        return ops.tiled_spmm(
            CSR(data, a.indices, a.indptr, a.shape), b, plans=plans
        )

    check_grads(f, (a.data, b), **GRAD_KW)


def test_tiled_spmm_grad_restricted_to_pattern(rng):
    # dA must match SDDMM(dC, B^T) on the pattern exactly
    a = random_csr(1, (32, 48), 0.08)
    b = jnp.asarray(rng.random((48, 16), dtype=np.float32))
    plans = build_plan_pair(a, blocksize=(8, 8))

    def loss(data):
        return ops.tiled_spmm(
            CSR(data, a.indices, a.indptr, a.shape), b, plans=plans
        ).sum()

    g = jax.grad(loss)(a.data)
    rows, cols = np.asarray(a.row_ids()), np.asarray(a.indices)
    expected = np.asarray(b).sum(axis=1)[cols]
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5, atol=1e-5)


def test_naive_spmm_grads(rng):
    a = random_csr(2, (32, 40), 0.12)
    b = jnp.asarray(rng.random((40, 16), dtype=np.float32))

    def f(data, b):
        return ops.naive_spmm(CSR(data, a.indices, a.indptr, a.shape), b)

    check_grads(f, (a.data, b), **GRAD_KW)


def test_sddmm_grads(rng):
    a = random_csr(3, (24, 32), 0.1)
    x = jnp.asarray(rng.random((24, 12), dtype=np.float32))
    y = jnp.asarray(rng.random((12, 32), dtype=np.float32))

    def f(x, y):
        return ops.sddmm(a, x, y)

    check_grads(f, (x, y), **GRAD_KW)


def test_sddmm_pallas_path_matches(rng):
    a = random_csr(4, (32, 64), 0.06)
    x = jnp.asarray(rng.random((32, 16), dtype=np.float32))
    y = jnp.asarray(rng.random((16, 64), dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(ops.sddmm(a, x, y, use_pallas=True)),
        np.asarray(ops.sddmm(a, x, y)),
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.parametrize("method", ["tiled", "naive", "reference"])
def test_spmm_dispatch_equivalence(rng, method):
    a = random_csr(5, (64, 96), 0.07)
    b = jnp.asarray(rng.random((96, 32), dtype=np.float32))
    out = ops.spmm(a, b, method=method)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize(
    "method",
    ["tiled", "naive", "reference", "gather", "dense", "footprint",
     "resident", "auto"],
)
def test_spmm_batched_b(rng, method):
    # 2-D sparse × 3-D dense: shared pattern, ONE launch with batch
    # folded into the column axis (the reference's dispatcher flatten,
    # matmuls.py:282-288) — parity vs the per-element vmap oracle
    a = random_csr(6, (32, 48), 0.1)
    b = jnp.asarray(rng.random((4, 48, 16), dtype=np.float32))
    out = ops.spmm(a, b, method=method)
    assert out.shape == (4, 32, 16)
    ref = jax.vmap(lambda bb: spmm_reference(a, bb))(b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_spmm_batched_fold_chunked(rng, monkeypatch):
    # force the memory-capped chunked fold (incl. a ragged final chunk)
    # on the gather path and check it matches the unchunked result
    from tpusparse import ops as ops_mod

    a = random_csr(16, (24, 40), 0.15)
    b = jnp.asarray(rng.random((5, 40, 8), dtype=np.float32))
    ref = ops.spmm(a, b, method="gather")
    # cap ~ 2 batch elements of folded columns -> 3 chunks, last ragged
    monkeypatch.setattr(
        ops_mod, "_FOLD_INTERMEDIATE_BYTES", 4 * a.nnz * 8 * 2
    )
    out = ops.spmm(a, b, method="gather")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_spmm_batched_4d_bert_shape(rng):
    # the reference's 4-D BERT batched-sparse case (naive test shape
    # class, tests/naive_kernel_test.py:66-68) at reduced size: leading
    # dims fold to one batch, batch folds into the executor's n-grid
    a = random_csr(17, (64, 64), 0.1)
    b = jnp.asarray(rng.random((3, 2, 64, 16), dtype=np.float32))
    out = ops.spmm(a, b, method="tiled")
    assert out.shape == (3, 2, 64, 16)
    ref = jax.vmap(jax.vmap(lambda bb: spmm_reference(a, bb)))(b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_spmm_batched_grads(rng):
    # gradients flow through the fold's transposes into the custom_vjp
    a = random_csr(18, (32, 48), 0.1)
    b = jnp.asarray(rng.random((3, 48, 16), dtype=np.float32))
    plans = build_plan_pair(a, blocksize=(8, 16))

    def f(data, bb):
        return ops.tiled_spmm(
            CSR(data, a.indices, a.indptr, a.shape), bb, plans=plans
        )

    check_grads(f, (a.data, b), **GRAD_KW)


@pytest.mark.parametrize("method", ["naive", "reference"])
def test_spmm_batched_reduce_return_arg(rng, method):
    # folded reducers act per output element, so min/max + the argmin
    # matrix survive the fold exactly
    a = random_csr(19, (16, 24), 0.2)
    b = jnp.asarray(rng.random((3, 24, 8), dtype=np.float32))
    vals, arg = ops.spmm(a, b, method=method, reduce="max", return_arg=True)
    assert vals.shape == (3, 16, 8) and arg.shape == (3, 16, 8)
    for i in range(3):
        rv, ra = spmm_reference(a, b[i], reduce="max", return_arg=True)
        np.testing.assert_allclose(
            np.asarray(vals[i]), np.asarray(rv), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(arg[i]), np.asarray(ra))


def test_route_cache_batched_vs_2d_distinct(rng):
    # a batched call must route at the FOLDED width — its cache entry
    # cannot collide with the same pattern's 2-D entry
    from tpusparse.ops import _ROUTE_CACHE, _route_spmm

    a = random_csr(20, (32, 48), 0.1)
    b2 = jnp.zeros((48, 16))
    b3 = jnp.zeros((8, 48, 16))
    _ROUTE_CACHE.clear()
    _route_spmm(a, b2, None)
    n_entries = len(_ROUTE_CACHE)
    _route_spmm(a, b3, None)
    assert len(_ROUTE_CACHE) == n_entries + 1


def test_spmm_reduce_dispatch(rng):
    a = random_csr(7, (32, 32), 0.2)
    b = jnp.asarray(rng.random((32, 8), dtype=np.float32))
    for reduce in ("mean", "max", "min"):
        np.testing.assert_allclose(
            np.asarray(ops.spmm(a, b, reduce=reduce)),
            np.asarray(spmm_reference(a, b, reduce=reduce)),
            rtol=1e-5,
            atol=1e-5,
        )


def test_tiled_spmm_under_jit_no_retrace(rng):
    a = random_csr(8, (32, 32), 0.1)
    b = jnp.ones((32, 8))
    plans = build_plan_pair(a)
    traces = 0

    @jax.jit
    def step(data, b):
        nonlocal traces
        traces += 1
        return ops.tiled_spmm(
            CSR(data, a.indices, a.indptr, a.shape), b, plans=plans
        ).sum()

    step(a.data, b)
    step(a.data * 2, b)
    assert traces == 1


def test_naive_spmm_under_jit_uses_concrete_width(rng):
    """Inside jit the CSR arrays are tracers; the ELL width must be
    resolved at the public entry (concrete) or the kernel falls back to
    width=k and overflows its 1MB SMEM prefetch budget (shipped bug:
    ts.naive_spmm under jit OOM'd SMEM at 512x512 @ 10%)."""
    from tpusparse.ops import resolve_ell_width

    a = random_csr(40, (256, 256), 0.1)
    assert resolve_ell_width(a) < 60  # max row nnz, not min(nnz, k)=256
    b = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))

    @jax.jit
    def run(data, bb):
        a2 = CSR(data=data, indices=a.indices, indptr=a.indptr, shape=a.shape)
        return ops.naive_spmm(a2, bb)

    out = np.asarray(run(a.data, b))
    ref = np.asarray(a.to_dense(), np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-5)


def test_naive_spmm_smem_guard():
    from tpusparse.kernels.naive_spmm import naive_spmm_pallas
    from tpusparse.utils.config import set_config

    col_idx = jnp.zeros((2048, 512), jnp.int32)
    vals = jnp.zeros((2048, 512), jnp.float32)
    npr = jnp.zeros((2048,), jnp.int32)
    set_config(interpret=False)
    try:
        with pytest.raises(ValueError, match="SMEM"):
            naive_spmm_pallas(
                (col_idx, vals, npr), (2048, 4096), jnp.zeros((4096, 64))
            )
    finally:
        set_config(interpret=None)


def test_spmm_blocks_grads(rng):
    # block-form op: the backward must match dense gradient algebra
    # WITHOUT densifying A (block_transpose_plan path)
    a = random_csr(4, (48, 64), 0.12)
    plan = build_plan(a, blocksize=(8, 16))
    blocks = plan.pack_values(a.data)
    b = jnp.asarray(rng.random((64, 24), dtype=np.float32))

    def f(blk, bb):
        return ops.spmm_blocks(plan, blk, bb)

    check_grads(f, (blocks, b), **GRAD_KW)


def test_spmm_blocks_db_matches_dense(rng):
    # explicit dB parity vs the dense formula Aᵀ·dC (non-square to catch
    # any transpose-plan geometry mix-ups)
    a = random_csr(5, (40, 72), 0.15)
    plan = build_plan(a, blocksize=(8, 8))
    blocks = plan.pack_values(a.data)
    b = jnp.asarray(rng.random((72, 16), dtype=np.float32))
    g = jnp.asarray(rng.random((40, 16), dtype=np.float32))

    _, vjp = jax.vjp(lambda bb: ops.spmm_blocks(plan, blocks, bb), b)
    (db,) = vjp(g)
    a_dense = np.asarray(a.to_dense(), np.float64)
    expected = a_dense.T @ np.asarray(g, np.float64)
    np.testing.assert_allclose(np.asarray(db), expected, rtol=1e-4, atol=1e-4)


def test_block_transpose_plan_roundtrip(rng):
    # the derived transpose plan must reproduce Aᵀ block-for-block
    from tpusparse.plan import block_transpose_plan

    a = random_csr(6, (64, 40), 0.1)
    plan = build_plan(a, blocksize=(8, 8))
    blocks = plan.pack_values(a.data)
    plan_t, perm = block_transpose_plan(plan)
    assert plan_t.shape == (40, 64)
    assert plan_t.blocksize == (8, 8)
    blocks_ext = jnp.concatenate(
        [jnp.swapaxes(blocks, 1, 2), jnp.zeros((1, 8, 8), blocks.dtype)]
    )
    at_dense = plan_t.blocks_to_dense(blocks_ext[jnp.asarray(perm)])
    np.testing.assert_allclose(
        np.asarray(at_dense), np.asarray(a.to_dense()).T, rtol=0, atol=0
    )
