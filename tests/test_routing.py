"""Tests for the gather SpMM path, grouped executor, and the auto-router.

The router is the TPU generalization of the reference's implicit routing
(it always ran the kernel you named; SURVEY.md §7.3 makes kernel choice
an inspector decision).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpusparse as ts
from tpusparse.kernels.tiled_spmm import grouped_spmm_pallas
from tpusparse.ops import _route_spmm
from tpusparse.plan import build_plan, group_plan


def _dense_ref(a, b):
    return np.asarray(a.to_dense()).astype(np.float64) @ np.asarray(b).astype(
        np.float64
    )


@pytest.mark.parametrize("shape,density", [((64, 96), 0.05), ((128, 64), 0.2)])
def test_gather_spmm_parity(rng, shape, density):
    a = ts.random_csr(0, shape, density)
    b = jnp.asarray(rng.normal(size=(shape[1], 48)).astype(np.float32))
    out = np.asarray(ts.gather_spmm(a, b))
    np.testing.assert_allclose(out, _dense_ref(a, b), rtol=1e-4, atol=1e-5)


def test_gather_spmm_batched(rng):
    a = ts.random_csr(1, (32, 48), 0.1)
    b = jnp.asarray(rng.normal(size=(3, 48, 16)).astype(np.float32))
    out = np.asarray(ts.gather_spmm(a, b))
    for i in range(3):
        np.testing.assert_allclose(
            out[i], _dense_ref(a, b[i]), rtol=1e-4, atol=1e-5
        )


def test_gather_spmm_grads(rng):
    a = ts.random_csr(2, (24, 32), 0.15)
    b = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))

    def loss(data, bb):
        a2 = ts.CSR(data=data, indices=a.indices, indptr=a.indptr, shape=a.shape)
        return jnp.sum(ts.gather_spmm(a2, bb) ** 2)

    g_data, g_b = jax.grad(loss, argnums=(0, 1))(a.data, b)
    # numeric check against the dense formulation
    ad = a.to_dense()

    def dense_loss(dense_a, bb):
        return jnp.sum((dense_a @ bb) ** 2)

    gd_a, gd_b = jax.grad(dense_loss, argnums=(0, 1))(ad, b)
    rows = np.repeat(np.arange(24), np.diff(np.asarray(a.indptr)))
    np.testing.assert_allclose(
        np.asarray(g_data),
        np.asarray(gd_a)[rows, np.asarray(a.indices)],
        rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(gd_b), rtol=1e-4)


def test_gather_spmm_under_jit_traced_pattern(rng):
    """row expansion falls back to the jittable path for traced indptr."""
    a = ts.random_csr(3, (16, 24), 0.2)
    b = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32))

    @jax.jit
    def f(data, indices, indptr, bb):
        a2 = ts.CSR(data=data, indices=indices, indptr=indptr, shape=(16, 24))
        return ts.gather_spmm(a2, bb)

    out = np.asarray(
        f(a.data, jnp.asarray(a.indices), jnp.asarray(a.indptr), b)
    )
    np.testing.assert_allclose(out, _dense_ref(a, b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("G", [4, 16])
def test_grouped_executor_parity(rng, G):
    a = ts.random_csr(4, (256, 384), 0.01)
    b = jnp.asarray(rng.normal(size=(384, 128)).astype(np.float32))
    plan = build_plan(a, blocksize=(8, 8))
    gp = group_plan(plan, G)
    bv = gp.pack_values(a.data)
    out = np.asarray(grouped_spmm_pallas(gp, bv, b))
    # 3-pass bf16 accumulation noise: ~1e-6 relative per product term
    np.testing.assert_allclose(out, _dense_ref(a, b), rtol=1e-4, atol=5e-5)
    # value pack/unpack roundtrip preserves CSR order
    np.testing.assert_allclose(np.asarray(gp.unpack_values(bv)), np.asarray(a.data))


def test_grouped_plan_cache():
    a = ts.random_csr(5, (64, 64), 0.05)
    plan = build_plan(a, blocksize=(8, 8))
    assert group_plan(plan, 8) is group_plan(plan, 8)
    assert group_plan(plan, 8) is not group_plan(plan, 4)


def test_router_regimes():
    b = jnp.zeros((4096, 256))
    ultra = ts.random_csr(0, (4096, 4096), 1e-4)
    assert _route_spmm(ultra, b, None) == "gather"
    # one-shot semantics: tiled pays a value pack (~5 ns/nnz), dense pays
    # a densify scatter (~9 ns/nnz) — mid/high unstructured density goes
    # tiled, never dense, under the fitted cost model
    nearly_dense = ts.random_csr(1, (4096, 4096), 0.05)
    assert _route_spmm(nearly_dense, b, None) == "tiled"
    rng = np.random.default_rng(2)
    mask = rng.random((32, 32)) < 0.1
    blocky = ts.CSR.from_dense(
        rng.random((4096, 4096), dtype=np.float32)
        * np.kron(mask, np.ones((128, 128), np.float32))
    )
    assert _route_spmm(blocky, b, None) == "tiled"


def test_spmm_auto_and_explicit_methods_agree(rng):
    a = ts.random_csr(6, (64, 80), 0.05)
    b = jnp.asarray(rng.normal(size=(80, 32)).astype(np.float32))
    ref = _dense_ref(a, b)
    for method in ("auto", "gather", "dense", "tiled", "naive", "reference"):
        out = np.asarray(ts.spmm(a, b, method=method))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5, err_msg=method)


def test_compact_executor_parity(rng):
    from tpusparse.kernels.tiled_spmm import compact_spmm_pallas
    from tpusparse.plan import compact_plan

    a = ts.random_csr(8, (256, 384), 0.02)
    b = jnp.asarray(rng.normal(size=(384, 128)).astype(np.float32))
    cp = compact_plan(build_plan(a, blocksize=(8, 64)))
    bv = cp.pack_values(a.data)
    out = np.asarray(compact_spmm_pallas(cp, bv, b))
    np.testing.assert_allclose(out, _dense_ref(a, b), rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(cp.unpack_values(bv)), np.asarray(a.data))


def test_mxu_bf16x3_fidelity(rng):
    """The manual 3-pass decomposition must be ~fp32-fidelity, far tighter
    than single-pass bf16."""
    from tpusparse.kernels import mxu

    a = jnp.asarray(rng.normal(size=(64, 512)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
    exact = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.abs(exact).max()

    err3 = np.abs(np.asarray(mxu.dot(a, b, "bf16x3")) - exact).max() / scale
    assert err3 < 1e-5, err3
    if jax.default_backend() == "tpu":
        # on TPU, DEFAULT is single-pass bf16 — bf16x3 must be far tighter
        # (on CPU, DEFAULT is true fp32, so no such relation holds)
        err1 = (
            np.abs(
                np.asarray(mxu.dot(a, b, jax.lax.Precision.DEFAULT)) - exact
            ).max()
            / scale
        )
        assert err3 < err1 / 20, (err3, err1)
    # dot_nt agrees with dot on transposed operand
    nt = np.asarray(mxu.dot_nt(a, jnp.swapaxes(b, 0, 1), "bf16x3"))
    np.testing.assert_allclose(nt, np.asarray(mxu.dot(a, b, "bf16x3")), rtol=1e-6)


def test_random_powerlaw_csr_skew():
    a = ts.random_powerlaw_csr(0, (512, 512), avg_nnz_per_row=8.0)
    deg = np.diff(np.asarray(a.indptr))
    assert deg.min() >= 1
    assert 4.0 <= deg.mean() <= 12.0
    assert deg.max() > 5 * deg.mean()  # genuinely skewed
    # structurally valid
    from tpusparse.utils.debug import validate_csr

    validate_csr(a)


def test_spmm_powerlaw_all_methods(rng):
    a = ts.random_powerlaw_csr(1, (128, 160), avg_nnz_per_row=4.0)
    b = jnp.asarray(rng.normal(size=(160, 32)).astype(np.float32))
    ref = _dense_ref(a, b)
    for method in ("auto", "gather", "tiled", "reference"):
        out = np.asarray(ts.spmm(a, b, method=method))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-5, err_msg=method)


def test_spmm_accepts_bsr(rng):
    dense = np.zeros((64, 96), np.float32)
    dense[0:8, 0:16] = rng.normal(size=(8, 16))
    dense[32:40, 80:96] = rng.normal(size=(8, 16))
    bsr = ts.BSR.from_dense(dense, blocksize=(8, 16))
    b = jnp.asarray(rng.normal(size=(96, 32)).astype(np.float32))
    out = np.asarray(ts.spmm(bsr, b, method="tiled"))
    ref = dense.astype(np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-5)


def test_executors_multi_n_tile(rng):
    """n larger than the N block exercises the j grid dimension of all
    three executors (B strips re-fetched per tile)."""
    from tpusparse.kernels.tiled_spmm import (
        compact_spmm_pallas,
        grouped_spmm_pallas,
        tiled_spmm_pallas,
    )
    from tpusparse.plan import build_plan, compact_plan, group_plan
    from tpusparse.utils.config import get_config, set_config

    a = ts.random_csr(9, (128, 256), 0.05)
    b = jnp.asarray(rng.normal(size=(256, 384)).astype(np.float32))
    ref = _dense_ref(a, b)
    plan = build_plan(a, blocksize=(8, 32))
    set_config(spmm_block_n=128)  # force 3 N tiles
    try:
        out_t = np.asarray(tiled_spmm_pallas(plan, plan.pack_values(a.data), b))
        cp = compact_plan(plan)
        out_c = np.asarray(compact_spmm_pallas(cp, cp.pack_values(a.data), b))
        gp = group_plan(plan, 4)
        out_g = np.asarray(grouped_spmm_pallas(gp, gp.pack_values(a.data), b))
    finally:
        set_config(spmm_block_n=512)
    for name, out in (("tiled", out_t), ("compact", out_c), ("grouped", out_g)):
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-5, err_msg=name)


def test_spmm_batched_through_all_routes(rng):
    a = ts.random_csr(10, (48, 64), 0.08)
    b3 = jnp.asarray(rng.normal(size=(3, 64, 32)).astype(np.float32))
    for method in ("auto", "gather", "dense", "tiled"):
        out = np.asarray(ts.spmm(a, b3, method=method))
        assert out.shape == (3, 48, 32)
        for i in range(3):
            np.testing.assert_allclose(
                out[i], _dense_ref(a, b3[i]), rtol=1e-4, atol=5e-5, err_msg=method
            )


def test_spmm_rejects_k_mismatch(rng):
    """XLA gathers clamp OOB indices, so without an eager check a
    k-mismatched b returns silently wrong values (caught by error probe)."""
    a = ts.random_csr(11, (64, 96), 0.1)
    bad = jnp.zeros((7, 3), jnp.float32)
    for call in (
        lambda: ts.spmm(a, bad),
        lambda: ts.gather_spmm(a, bad),
        lambda: ts.naive_spmm(a, bad),
        lambda: ts.tiled_spmm(a, bad),
        lambda: ts.spmm(a, jnp.zeros((5,), jnp.float32)),  # SpMV mismatch
    ):
        with pytest.raises(ValueError, match="incompatible"):
            call()


def test_spmm_folds_4d_batches(rng):
    a = ts.random_csr(13, (32, 48), 0.1)
    b4 = jnp.asarray(rng.normal(size=(2, 3, 48, 16)).astype(np.float32))
    out = np.asarray(ts.spmm(a, b4))
    assert out.shape == (2, 3, 32, 16)
    for i in range(2):
        for j in range(3):
            np.testing.assert_allclose(
                out[i, j], _dense_ref(a, b4[i, j]), rtol=1e-4, atol=5e-5
            )


def test_spmm_footprint_method(rng):
    a = ts.random_csr(14, (96, 128), 0.08)
    b = jnp.asarray(rng.normal(size=(128, 48)).astype(np.float32))
    out = np.asarray(ts.spmm(a, b, method="footprint"))
    np.testing.assert_allclose(out, _dense_ref(a, b), rtol=1e-4, atol=5e-5)
    # gradients flow like the tiled path
    def loss(data):
        a2 = ts.CSR(data=data, indices=a.indices, indptr=a.indptr, shape=a.shape)
        return jnp.sum(ts.footprint_spmm(a2, b) ** 2)
    dA = np.asarray(jax.grad(loss)(a.data))
    def loss_t(data):
        a2 = ts.CSR(data=data, indices=a.indices, indptr=a.indptr, shape=a.shape)
        return jnp.sum(ts.spmm(a2, b, method="tiled") ** 2)
    dA_t = np.asarray(jax.grad(loss_t)(a.data))
    np.testing.assert_allclose(dA, dA_t, rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize(
    "method", ["gather", "tiled", "naive", "dense", "footprint", "reference"]
)
def test_spmm_bf16_operands(rng, method):
    """bf16 sparse values x bf16 dense flow through every route with
    bf16-class accuracy (the reference is fp32-only; bf16 is the TPU
    production dtype and must not silently upcast or crash)."""
    dense_np = rng.normal(size=(64, 96)).astype(np.float32) * (
        rng.random((64, 96)) < 0.1
    )
    a32 = ts.CSR.from_dense(dense_np)
    a16 = ts.CSR(
        data=jnp.asarray(a32.data).astype(jnp.bfloat16),
        indices=a32.indices,
        indptr=a32.indptr,
        shape=a32.shape,
    )
    b16 = jnp.asarray(rng.normal(size=(96, 32)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ref = dense_np.astype(np.float64) @ np.asarray(
        b16.astype(jnp.float32), np.float64
    )
    out = ts.spmm(a16, b16, method=method)
    err = np.abs(np.asarray(out, np.float32) - ref).max() / np.abs(ref).max()
    assert err < 0.05, (method, err)


def test_spmm_rejects_reducer_on_sum_only_methods(rng):
    """Explicit sum-only kernels must raise for a requested reducer, not
    silently return the sum."""
    a = ts.random_csr(15, (32, 48), 0.1)
    b = jnp.asarray(rng.normal(size=(48, 8)).astype(np.float32))
    for method in ("gather", "tiled", "footprint", "dense"):
        with pytest.raises(ValueError, match="sum"):
            ts.spmm(a, b, method=method, reduce="max")
    # naive and auto still honor reducers
    out = np.asarray(ts.spmm(a, b, method="naive", reduce="max"))
    np.testing.assert_allclose(
        out, np.asarray(ts.spmm_reference(a, b, reduce="max")),
        rtol=1e-4, atol=1e-5,
    )


def test_spmm_auto_works_under_jit(rng):
    """Traced patterns must route to gather (jittable fallback) — routing
    to tiled crashed with a TracerArrayConversionError from the host
    inspector."""
    a = ts.random_csr(16, (64, 96), 0.05)
    b = jnp.asarray(rng.normal(size=(96, 16)).astype(np.float32))

    @jax.jit
    def run(data, indices, indptr, bb):
        a2 = ts.CSR(data=data, indices=indices, indptr=indptr, shape=(64, 96))
        return ts.spmm(a2, bb)

    out = np.asarray(run(a.data, a.indices, a.indptr, b))
    np.testing.assert_allclose(
        out, _dense_ref(a, b), rtol=1e-4, atol=5e-5
    )


def test_route_cache_keys_on_batch_split():
    """Two 3-D b's with the SAME folded width but different
    (batch, n) splits must route independently: the fold-copy term
    (charged only when the batch-grid executor can't run) depends on
    the split, not the product (r5)."""
    from tpusparse.ops import _ROUTE_CACHE, _route_spmm

    a = ts.random_csr(31, (512, 512), 0.10)
    m1 = _route_spmm(a, jnp.zeros((4096, 512, 64)), None)
    m2 = _route_spmm(a, jnp.zeros((512, 512, 512)), None)
    # same folded width (262144); the wide-per-element form is
    # batched-resident-eligible, the narrow one folds
    keys = [k for k in _ROUTE_CACHE if k[1] == 4096 * 64]
    assert len(keys) >= 2, keys
    assert m1 == "dense"  # fold copies priced in -> dense wins
