"""SpGEMM (sparse × sparse → sparse) tests: pattern + values vs a host
fp64 dense oracle, autograd, jit/plan reuse, and edge cases.

New capability beyond the reference (all its kernels are sparse × dense,
SURVEY.md §2.1), so there is no reference test analog — the oracle is
the dense product, following the suite's golden-reference convention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from tpusparse import CSR, random_csr, random_powerlaw_csr
from tpusparse.spgemm import spgemm, spgemm_plan, spgemm_reference

GRAD_KW = dict(order=1, modes=["rev"], atol=5e-3, rtol=5e-3, eps=1e-3)


def _check(a, b):
    c = spgemm(a, b)
    ref = spgemm_reference(a, b)
    got = np.asarray(c.to_dense(), dtype=np.float64)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got / scale, ref / scale, rtol=1e-5, atol=1e-5)
    # structural containment: every C slot is a reachable (i,j)
    sa = a.to_scipy().astype(bool)
    sb = b.to_scipy().astype(bool)
    pat = (sa @ sb).tocsr()
    np.testing.assert_array_equal(np.asarray(c.indptr), pat.indptr)
    np.testing.assert_array_equal(np.sort(np.asarray(c.indices)), np.sort(pat.indices))
    return c


@pytest.mark.parametrize(
    "a_shape,b_shape,da,db",
    [
        ((32, 48), (48, 24), 0.1, 0.1),
        ((64, 64), (64, 64), 0.05, 0.2),
        ((16, 128), (128, 8), 0.3, 0.02),
        ((50, 30), (30, 70), 0.15, 0.15),  # non-multiple-of-8 dims
    ],
)
def test_spgemm_matches_dense_oracle(a_shape, b_shape, da, db):
    a = random_csr(0, a_shape, da)
    b = random_csr(1, b_shape, db)
    _check(a, b)


def test_spgemm_square_power():
    """A @ A — the graph-ops motivating case (2-hop reachability)."""
    a = random_csr(2, (64, 64), 0.08)
    _check(a, a)


def test_spgemm_powerlaw_pattern():
    a = random_powerlaw_csr(3, (96, 64), avg_nnz_per_row=4.0)
    b = random_powerlaw_csr(4, (64, 48), avg_nnz_per_row=3.0)
    _check(a, b)


def test_spgemm_csr_order_and_dtypes():
    a = random_csr(5, (40, 32), 0.1)
    b = random_csr(6, (32, 40), 0.1)
    c = spgemm(a, b)
    indptr = np.asarray(c.indptr)
    indices = np.asarray(c.indices)
    assert indptr[0] == 0 and indptr[-1] == c.nnz
    assert (np.diff(indptr) >= 0).all()
    for r in range(c.shape[0]):  # within-row column order (sorted build)
        seg = indices[indptr[r] : indptr[r + 1]]
        assert (np.diff(seg) > 0).all()
    assert indices.dtype == np.int32 and indptr.dtype == np.int32


def test_spgemm_shape_mismatch():
    a = random_csr(0, (8, 16), 0.2)
    b = random_csr(1, (8, 16), 0.2)
    with pytest.raises(ValueError, match="shape mismatch"):
        spgemm(a, b)


def test_spgemm_plan_mismatch():
    a = random_csr(0, (8, 16), 0.2)
    b = random_csr(1, (16, 8), 0.2)
    plan = spgemm_plan(a, b)
    a2 = random_csr(2, (16, 16), 0.2)
    with pytest.raises(ValueError, match="plan built for"):
        spgemm(a2, b, plan=plan)


def test_spgemm_plan_cache_hit():
    a = random_csr(7, (24, 24), 0.1)
    b = random_csr(8, (24, 24), 0.1)
    p1 = spgemm_plan(a, b)
    # same patterns, different value objects -> same cached plan
    a2 = CSR(a.data * 2.0, a.indices, a.indptr, a.shape)
    p2 = spgemm_plan(a2, b)
    assert p1 is p2


def test_spgemm_empty_result():
    """Disjoint structure: A's columns never hit an occupied B row."""
    a = CSR(
        data=jnp.ones(2),
        indices=jnp.array([0, 1], jnp.int32),
        indptr=jnp.array([0, 1, 2, 2, 2], jnp.int32),
        shape=(4, 4),
    )
    b = CSR(
        data=jnp.ones(2),
        indices=jnp.array([0, 1], jnp.int32),
        indptr=jnp.array([0, 0, 0, 1, 2], jnp.int32),
        shape=(4, 4),
    )
    c = spgemm(a, b)
    assert c.nnz == 0
    np.testing.assert_array_equal(np.asarray(c.to_dense()), np.zeros((4, 4)))


def test_spgemm_numerical_cancellation_keeps_slot():
    """Products that cancel to 0.0 keep their structural slot (the
    pattern is value-independent, so the compiled program is too)."""
    a = CSR(
        data=jnp.array([1.0, -1.0]),
        indices=jnp.array([0, 1], jnp.int32),
        indptr=jnp.array([0, 2], jnp.int32),
        shape=(1, 2),
    )
    b = CSR(
        data=jnp.array([3.0, 3.0]),
        indices=jnp.array([0, 0], jnp.int32),
        indptr=jnp.array([0, 1, 2], jnp.int32),
        shape=(2, 1),
    )
    c = spgemm(a, b)
    assert c.nnz == 1
    assert float(c.data[0]) == 0.0


def test_spgemm_grads():
    a = random_csr(9, (24, 32), 0.15)
    b = random_csr(10, (32, 20), 0.15)
    plan = spgemm_plan(a, b)

    def f(ad, bd):
        c = spgemm(
            CSR(ad, a.indices, a.indptr, a.shape),
            CSR(bd, b.indices, b.indptr, b.shape),
            plan=plan,
        )
        return jnp.sum(c.data**2)

    check_grads(f, (a.data, b.data), **GRAD_KW)


def test_spgemm_grad_matches_dense_algebra(rng):
    """dA from the sparse path == dense dA = (dC @ Bᵀ) restricted to A's
    pattern (and symmetrically for dB)."""
    a = random_csr(11, (16, 24), 0.2)
    b = random_csr(12, (24, 12), 0.2)
    plan = spgemm_plan(a, b)
    g = jnp.asarray(rng.random((plan.c_nnz,), dtype=np.float32))

    def f(ad, bd):
        c_data = spgemm(
            CSR(ad, a.indices, a.indptr, a.shape),
            CSR(bd, b.indices, b.indptr, b.shape),
            plan=plan,
        ).data
        return jnp.vdot(g, c_data)

    da, db = jax.grad(f, argnums=(0, 1))(a.data, b.data)
    gc = CSR(g, jnp.asarray(plan.c_indices), jnp.asarray(plan.c_indptr), plan.c_shape)
    gc_d = np.asarray(gc.to_dense(), dtype=np.float64)
    ad_d = np.asarray(a.to_dense(), dtype=np.float64)
    bd_d = np.asarray(b.to_dense(), dtype=np.float64)
    da_dense = gc_d @ bd_d.T
    db_dense = ad_d.T @ gc_d
    rows_a = np.asarray(a.row_ids())
    rows_b = np.asarray(b.row_ids())
    np.testing.assert_allclose(
        np.asarray(da), da_dense[rows_a, np.asarray(a.indices)], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(db), db_dense[rows_b, np.asarray(b.indices)], rtol=1e-4, atol=1e-5
    )


def test_spgemm_under_jit_with_plan():
    a = random_csr(13, (32, 32), 0.1)
    b = random_csr(14, (32, 32), 0.1)
    plan = spgemm_plan(a, b)

    @jax.jit
    def f(ad, bd):
        return spgemm(
            CSR(ad, a.indices, a.indptr, a.shape),
            CSR(bd, b.indices, b.indptr, b.shape),
            plan=plan,
        ).data

    got = np.asarray(f(a.data, b.data))
    ref = spgemm_reference(a, b)
    rows = np.repeat(np.arange(32), np.diff(np.asarray(plan.c_indptr)))
    np.testing.assert_allclose(
        got, ref[rows, plan.c_indices], rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("method", ["schedule", "dense"])
def test_spgemm_methods_agree(method):
    a = random_csr(17, (48, 64), 0.1)
    b = random_csr(18, (64, 40), 0.1)
    c = spgemm(a, b, method=method)
    ref = spgemm_reference(a, b)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(c.to_dense(), np.float64) / scale, ref / scale,
        rtol=1e-4, atol=1e-5,
    )
    # identical structural pattern across methods
    c2 = spgemm(a, b, method="schedule" if method == "dense" else "dense")
    np.testing.assert_array_equal(np.asarray(c.indptr), np.asarray(c2.indptr))
    np.testing.assert_array_equal(np.asarray(c.indices), np.asarray(c2.indices))


def test_spgemm_dense_method_grads():
    a = random_csr(19, (24, 32), 0.15)
    b = random_csr(20, (32, 20), 0.15)

    def f(ad, bd):
        c = spgemm(
            CSR(ad, a.indices, a.indptr, a.shape),
            CSR(bd, b.indices, b.indptr, b.shape),
            method="dense",
        )
        return jnp.sum(c.data**2)

    check_grads(f, (a.data, b.data), **GRAD_KW)


def test_spgemm_auto_routes_by_fill():
    from tpusparse.spgemm import _route_spgemm

    # dense-ish product -> MXU route; sparse -> schedule route. The
    # windowed accumulation (r4) moved the crossover: the schedule now
    # runs ~430M products/s (was ~64M at the XLA scalar floor), so only
    # genuinely dense-ish products still route to the MXU.
    a_hi = random_csr(21, (512, 512), 0.3)
    assert _route_spgemm(a_hi, a_hi) == "dense"
    a_lo = random_csr(22, (512, 512), 0.002)
    assert _route_spgemm(a_lo, a_lo) == "schedule"


def test_spgemm_unknown_method():
    a = random_csr(0, (8, 8), 0.2)
    with pytest.raises(ValueError, match="unknown spgemm method"):
        spgemm(a, a, method="warp")


def test_spgemm_report():
    a = random_csr(15, (64, 64), 0.1)
    b = random_csr(16, (64, 64), 0.1)
    plan = spgemm_plan(a, b)
    rep = plan.report()
    assert rep["nmul"] > 0 and rep["c_nnz"] > 0
    assert rep["dense_mult_ratio"] > 1.0
    assert rep["mults_per_c_nnz"] >= 1.0


def test_spgemm_plan_native_matches_numpy(monkeypatch):
    """The C++ symbolic pass and the numpy fallback must produce the
    IDENTICAL plan (pattern and schedule, including within-slot product
    order — both traverse a_pos-major)."""
    from tpusparse.spgemm import _PLAN_CACHE
    from tpusparse.runtime import native

    if not native.available():
        pytest.skip("no native toolchain")
    a = random_csr(30, (128, 96), 0.08)
    b = random_csr(31, (96, 80), 0.08)
    _PLAN_CACHE.clear()
    p_nat = spgemm_plan(a, b)
    _PLAN_CACHE.clear()
    monkeypatch.setattr(native, "available", lambda: False)
    p_np = spgemm_plan(a, b)
    _PLAN_CACHE.clear()
    np.testing.assert_array_equal(p_nat.c_indptr, p_np.c_indptr)
    np.testing.assert_array_equal(p_nat.c_indices, p_np.c_indices)
    np.testing.assert_array_equal(np.asarray(p_nat.a_pos), np.asarray(p_np.a_pos))
    np.testing.assert_array_equal(np.asarray(p_nat.b_pos), np.asarray(p_np.b_pos))
    np.testing.assert_array_equal(np.asarray(p_nat.c_pos), np.asarray(p_np.c_pos))


def test_chunked_windowed_accumulation_exact():
    """The VMEM-chunked segment path (>4M products in production) made
    exercisable at test size: build chunk plans directly with a small
    target and run the chunked execution against the stock segment_sum."""
    import dataclasses

    import jax.numpy as jnp

    from tpusparse.spgemm import _chunk_segment_plans, _spgemm_data, spgemm_plan

    a = random_csr(31, (256, 256), 0.05)
    b = random_csr(32, (256, 256), 0.05)
    plan = spgemm_plan(a, b)
    seg = np.asarray(plan.c_pos)
    chunks = _chunk_segment_plans(
        seg, plan.c_nnz, lambda p, n: True, target=max(seg.size // 3, 1)
    )
    assert chunks is not None and len(chunks) >= 2
    # chunk ranges tile [0, c_nnz) exactly
    assert chunks[0][2] == 0 and sum(c[3] for c in chunks) == plan.c_nnz
    forced = dataclasses.replace(plan, ws_c=None, ws_c_chunks=tuple(chunks))
    got = np.asarray(_spgemm_data(forced, a.data, b.data))
    ref = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(a.data)[plan.a_pos] * jnp.asarray(b.data)[plan.b_pos],
            plan.c_pos, num_segments=plan.c_nnz, indices_are_sorted=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
