"""Sparse elementwise algebra + dense×sparse (dsmm) tests — golden
reference vs numpy/scipy fp64, plus autograd through the pure-jnp paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as ssp
from jax.test_util import check_grads

import tpusparse as ts
from tpusparse import (
    block_diag,
    hstack,
    vstack,
    CSR,
    col_reduce,
    dsmm,
    prune_csr,
    random_csr,
    random_powerlaw_csr,
    row_reduce,
    sp_add,
    sp_hadamard,
    sp_map,
    sp_norm,
    sp_scale,
    sp_sub,
    transpose_csr,
)

GRAD_KW = dict(order=1, modes=["rev"], atol=5e-3, rtol=5e-3, eps=1e-3)


# ---------------------------------------------------------------------------
# dsmm — dense × sparse
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("x_shape", [(40,), (6, 40), (2, 3, 40)])
@pytest.mark.parametrize("method", ["auto", "gather", "reference"])
def test_dsmm_matches_dense(rng, x_shape, method):
    a = random_csr(0, (40, 24), 0.15)
    x = jnp.asarray(rng.random(x_shape, dtype=np.float32))
    out = dsmm(x, a, method=method)
    ref = np.asarray(x, dtype=np.float64) @ np.asarray(
        a.to_dense(), dtype=np.float64
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=5e-5)


def test_dsmm_tiled_route(rng):
    a = random_csr(1, (64, 48), 0.2)
    x = jnp.asarray(rng.random((8, 64), dtype=np.float32))
    out = dsmm(x, a, method="tiled")
    ref = np.asarray(x, dtype=np.float64) @ np.asarray(
        a.to_dense(), dtype=np.float64
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=5e-5)


def test_dsmm_shape_mismatch(rng):
    a = random_csr(0, (40, 24), 0.15)
    with pytest.raises(ValueError, match="incompatible"):
        dsmm(jnp.zeros((6, 24)), a)


def test_dsmm_grads(rng):
    a = random_csr(2, (32, 20), 0.2)
    x = jnp.asarray(rng.random((4, 32), dtype=np.float32))

    def f(xx, ad):
        return dsmm(xx, CSR(ad, a.indices, a.indptr, a.shape), method="gather")

    check_grads(f, (x, a.data), **GRAD_KW)


def test_transpose_csr_matches_scipy():
    a = random_powerlaw_csr(3, (48, 32), avg_nnz_per_row=3.0)
    at = transpose_csr(a)
    np.testing.assert_allclose(
        np.asarray(at.to_dense()), np.asarray(a.to_dense()).T, rtol=0, atol=0
    )
    # canonical CSR: sorted within rows (stable column sort)
    indptr = np.asarray(at.indptr)
    indices = np.asarray(at.indices)
    for r in range(at.shape[0]):
        seg = indices[indptr[r] : indptr[r + 1]]
        assert (np.diff(seg) >= 0).all()


def test_transpose_csr_cache_reuses_pattern():
    a = random_csr(4, (24, 24), 0.1)
    t1 = transpose_csr(a)
    a2 = CSR(a.data * 3.0, a.indices, a.indptr, a.shape)
    t2 = transpose_csr(a2)
    # same host pattern objects (cache hit), fresh traced data
    assert t1.indices is t2.indices or np.shares_memory(
        np.asarray(t1.indices), np.asarray(t2.indices)
    ) or np.array_equal(np.asarray(t1.indices), np.asarray(t2.indices))
    np.testing.assert_allclose(
        np.asarray(t2.data), 3.0 * np.asarray(t1.data)
    )


# ---------------------------------------------------------------------------
# add / hadamard / scale / map
# ---------------------------------------------------------------------------


def test_sp_add_matches_scipy():
    a = random_csr(5, (32, 40), 0.1)
    b = random_csr(6, (32, 40), 0.15)
    c = sp_add(a, b, alpha=2.0, beta=-0.5)
    ref = 2.0 * np.asarray(a.to_dense(), np.float64) - 0.5 * np.asarray(
        b.to_dense(), np.float64
    )
    np.testing.assert_allclose(np.asarray(c.to_dense()), ref, rtol=1e-5, atol=1e-6)
    # union pattern == scipy's structural union
    pat = (
        (a.to_scipy().astype(bool) + b.to_scipy().astype(bool))
        .astype(bool)
        .tocsr()
    )
    assert c.nnz == pat.nnz
    np.testing.assert_array_equal(np.asarray(c.indptr), pat.indptr)


def test_sp_add_keeps_cancelled_slots():
    a = CSR(
        jnp.array([1.0]),
        jnp.array([2], jnp.int32),
        jnp.array([0, 1], jnp.int32),
        (1, 4),
    )
    b = CSR(
        jnp.array([-1.0]),
        jnp.array([2], jnp.int32),
        jnp.array([0, 1], jnp.int32),
        (1, 4),
    )
    c = sp_add(a, b)
    assert c.nnz == 1 and float(c.data[0]) == 0.0


def test_sp_sub_and_scale():
    a = random_csr(7, (16, 16), 0.2)
    z = sp_sub(a, a)
    assert np.abs(np.asarray(z.data)).max() == 0.0
    s = sp_scale(a, 2.0)
    np.testing.assert_allclose(
        np.asarray(s.to_dense()), 2.0 * np.asarray(a.to_dense())
    )


def test_sp_hadamard_matches_scipy():
    a = random_csr(8, (32, 24), 0.2)
    b = random_csr(9, (32, 24), 0.25)
    c = sp_hadamard(a, b)
    ref = np.asarray(a.to_dense(), np.float64) * np.asarray(
        b.to_dense(), np.float64
    )
    np.testing.assert_allclose(np.asarray(c.to_dense()), ref, rtol=1e-5, atol=1e-6)
    # intersection pattern
    inter = a.to_scipy().astype(bool).multiply(b.to_scipy().astype(bool)).tocsr()
    assert c.nnz == inter.nnz


def test_sp_add_hadamard_grads():
    a = random_csr(10, (16, 20), 0.2)
    b = random_csr(11, (16, 20), 0.2)

    def f_add(ad, bd):
        c = sp_add(
            CSR(ad, a.indices, a.indptr, a.shape),
            CSR(bd, b.indices, b.indptr, b.shape),
            alpha=1.5,
            beta=-2.0,
        )
        return jnp.sum(c.data**2)

    check_grads(f_add, (a.data, b.data), **GRAD_KW)

    def f_had(ad, bd):
        c = sp_hadamard(
            CSR(ad, a.indices, a.indptr, a.shape),
            CSR(bd, b.indices, b.indptr, b.shape),
        )
        return jnp.sum(c.data**2)

    check_grads(f_had, (a.data, b.data), **GRAD_KW)


def test_sp_map():
    a = random_csr(12, (8, 8), 0.3)
    m = sp_map(a, jnp.abs)
    assert (np.asarray(m.data) >= 0).all()
    assert m.nnz == a.nnz


def test_shape_mismatch_raises():
    a = random_csr(0, (8, 8), 0.2)
    b = random_csr(1, (8, 9), 0.2)
    with pytest.raises(ValueError, match="shape mismatch"):
        sp_add(a, b)
    with pytest.raises(ValueError, match="shape mismatch"):
        sp_hadamard(a, b)


# ---------------------------------------------------------------------------
# prune
# ---------------------------------------------------------------------------


def test_prune_threshold():
    a = random_csr(13, (32, 32), 0.3)
    p = prune_csr(a, threshold=0.5)
    d = np.asarray(a.to_dense())
    ref = np.where(np.abs(d) > 0.5, d, 0.0)
    np.testing.assert_allclose(np.asarray(p.to_dense()), ref)
    assert (np.abs(np.asarray(p.data)) > 0.5).all()


def test_prune_density():
    a = random_csr(14, (32, 32), 0.5)
    p = prune_csr(a, density=0.4)
    keep_n = max(1, int(round(0.4 * a.nnz)))
    assert p.nnz == keep_n
    # kept values are the largest-magnitude ones
    kept = np.sort(np.abs(np.asarray(p.data)))
    top = np.sort(np.abs(np.asarray(a.data)))[-keep_n:]
    np.testing.assert_allclose(kept, top)


def test_prune_arg_validation():
    a = random_csr(0, (8, 8), 0.2)
    with pytest.raises(ValueError, match="exactly one"):
        prune_csr(a)
    with pytest.raises(ValueError, match="exactly one"):
        prune_csr(a, threshold=0.1, density=0.5)


# ---------------------------------------------------------------------------
# reductions / norms
# ---------------------------------------------------------------------------


def test_row_col_reduce():
    a = random_powerlaw_csr(15, (24, 16), avg_nnz_per_row=3.0)
    d = np.asarray(a.to_dense(), np.float64)
    np.testing.assert_allclose(
        np.asarray(row_reduce(a, "sum")), d.sum(axis=1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(col_reduce(a, "sum")), d.sum(axis=0), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(row_reduce(a, "nnz")), np.diff(np.asarray(a.indptr))
    )


def test_row_reduce_empty_rows_and_modes():
    a = CSR(
        jnp.array([2.0, -3.0, 4.0]),
        jnp.array([0, 1, 2], jnp.int32),
        jnp.array([0, 2, 2, 3], jnp.int32),
        (3, 4),
    )
    np.testing.assert_allclose(np.asarray(row_reduce(a, "max")), [2.0, 0.0, 4.0])
    np.testing.assert_allclose(np.asarray(row_reduce(a, "min")), [-3.0, 0.0, 4.0])
    np.testing.assert_allclose(
        np.asarray(row_reduce(a, "mean")), [-0.5, 0.0, 4.0]
    )
    with pytest.raises(ValueError, match="unknown reduce"):
        row_reduce(a, "prod")


def test_vstack_hstack_block_diag():
    mats = [
        random_csr(20, (8, 12), 0.2),
        random_powerlaw_csr(21, (5, 12), avg_nnz_per_row=2.0),
        random_csr(22, (3, 12), 0.5),
    ]
    v = vstack(mats)
    ref_v = np.concatenate([np.asarray(m.to_dense()) for m in mats], axis=0)
    np.testing.assert_allclose(np.asarray(v.to_dense()), ref_v)

    hmats = [
        random_csr(23, (7, 8), 0.2),
        random_csr(24, (7, 5), 0.4),
        random_csr(25, (7, 16), 0.1),
    ]
    h = hstack(hmats)
    ref_h = np.concatenate([np.asarray(m.to_dense()) for m in hmats], axis=1)
    np.testing.assert_allclose(np.asarray(h.to_dense()), ref_h)
    # canonical ordering preserved within rows (each input sorted)
    indptr = np.asarray(h.indptr)
    indices = np.asarray(h.indices)
    for r in range(h.shape[0]):
        seg = indices[indptr[r] : indptr[r + 1]]
        assert (np.diff(seg) > 0).all()

    bd = block_diag(mats)
    assert bd.shape == (16, 36)
    import scipy.sparse as ssp

    ref_bd = ssp.block_diag([m.to_scipy() for m in mats]).toarray()
    np.testing.assert_allclose(np.asarray(bd.to_dense()), ref_bd)


def test_stack_shape_validation():
    a = random_csr(0, (4, 6), 0.3)
    b = random_csr(1, (4, 7), 0.3)
    with pytest.raises(ValueError, match="column counts differ"):
        vstack([a, b])
    c = random_csr(2, (5, 6), 0.3)
    with pytest.raises(ValueError, match="row counts differ"):
        hstack([a, c])
    with pytest.raises(ValueError, match="at least one"):
        block_diag([])


def test_block_diag_batched_heterogeneous_spmm(rng):
    """The SURVEY §7.3 'block-diagonal flattening' strategy: batched SpMM
    with a DIFFERENT pattern per batch element as ONE plan/product."""
    from tpusparse import spmm

    a1 = random_csr(26, (16, 24), 0.1)
    a2 = random_powerlaw_csr(27, (16, 24), avg_nnz_per_row=3.0)
    x1 = jnp.asarray(rng.random((24, 8), dtype=np.float32))
    x2 = jnp.asarray(rng.random((24, 8), dtype=np.float32))
    big = block_diag([a1, a2])
    out = spmm(big, jnp.concatenate([x1, x2], axis=0), method="gather")
    ref = np.concatenate(
        [
            np.asarray(a1.to_dense(), np.float64) @ np.asarray(x1, np.float64),
            np.asarray(a2.to_dense(), np.float64) @ np.asarray(x2, np.float64),
        ],
        axis=0,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=5e-5)


def test_stack_grads():
    mats = [random_csr(28, (4, 6), 0.3), random_csr(29, (3, 6), 0.4)]

    def f(d1, d2):
        v = vstack(
            [
                CSR(d1, mats[0].indices, mats[0].indptr, mats[0].shape),
                CSR(d2, mats[1].indices, mats[1].indptr, mats[1].shape),
            ]
        )
        return jnp.sum(v.data**2)

    check_grads(f, (mats[0].data, mats[1].data), **GRAD_KW)


def test_sp_norm():
    a = random_csr(16, (16, 20), 0.25)
    sp = a.to_scipy()
    d = np.abs(np.asarray(a.to_dense(), np.float64))
    np.testing.assert_allclose(
        float(sp_norm(a, "fro")),
        np.sqrt((np.asarray(sp.data) ** 2).sum()),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(sp_norm(a, 1)), d.sum(axis=0).max(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(sp_norm(a, "inf")), d.sum(axis=1).max(), rtol=1e-5
    )
    with pytest.raises(ValueError, match="unsupported norm"):
        sp_norm(a, 2)


# ---------------------------------------------------------------------------
# row_softmax — sparse-attention normalization
# ---------------------------------------------------------------------------


def _masked_softmax_dense(a):
    """fp64 oracle: softmax over stored entries, absent entries = -inf."""
    d = np.asarray(a.to_dense(), np.float64)
    mask = np.asarray(a.to_scipy().astype(bool).todense())
    e = np.where(mask, d, -np.inf)
    emax = e.max(axis=1, keepdims=True)
    emax = np.where(np.isfinite(emax), emax, 0.0)
    p = np.where(mask, np.exp(e - emax), 0.0)
    s = p.sum(axis=1, keepdims=True)
    return np.divide(p, s, out=np.zeros_like(p), where=s > 0)


def test_row_softmax_matches_dense_masked():
    from tpusparse import row_softmax

    a = random_csr(7, (24, 32), 0.2)
    out = row_softmax(a)
    np.testing.assert_allclose(
        np.asarray(out.to_dense(), np.float64),
        _masked_softmax_dense(a),
        rtol=1e-5,
        atol=1e-7,
    )
    # rows with entries sum to exactly 1
    sums = np.asarray(row_reduce(out, "sum"))
    nnz_rows = np.asarray(row_reduce(out, "nnz")) > 0
    np.testing.assert_allclose(sums[nnz_rows], 1.0, rtol=1e-6)


def test_row_softmax_empty_rows_and_stability():
    from tpusparse import row_softmax

    dense = np.zeros((4, 4), np.float32)
    dense[0, 1] = 1e4  # would overflow exp without the max shift
    dense[0, 2] = 1e4 - 1.0
    dense[2, 0] = -3.0
    a = CSR.from_dense(jnp.asarray(dense))
    out = row_softmax(a)
    od = np.asarray(out.to_dense(), np.float64)
    assert np.isfinite(od).all()
    np.testing.assert_allclose(od[0, 1] + od[0, 2], 1.0, rtol=1e-6)
    assert od[0, 1] > od[0, 2]
    np.testing.assert_allclose(od[2, 0], 1.0, rtol=1e-6)  # singleton row
    np.testing.assert_allclose(od[1], 0.0)  # empty rows stay empty
    np.testing.assert_allclose(od[3], 0.0)


def test_row_softmax_temperature_and_grad():
    from tpusparse import row_softmax

    a = random_csr(8, (12, 16), 0.3)
    hot = np.asarray(row_softmax(a, temperature=0.1).to_dense())
    cold = np.asarray(row_softmax(a, temperature=10.0).to_dense())
    # lower temperature concentrates mass
    assert hot.max() >= cold.max()

    def f(data):
        return (row_softmax(CSR(data, a.indices, a.indptr, a.shape)).data ** 2).sum()

    check_grads(f, (a.data,), **GRAD_KW)


def test_row_softmax_under_jit():
    from tpusparse import row_softmax

    a = random_csr(9, (16, 16), 0.25)
    eager = row_softmax(a).data

    @jax.jit
    def f(data):
        return row_softmax(CSR(data, a.indices, a.indptr, a.shape)).data

    np.testing.assert_allclose(np.asarray(eager), np.asarray(f(a.data)), rtol=1e-6)


# ---------------------------------------------------------------------------
# permute_csr — P A Qᵀ pattern pass
# ---------------------------------------------------------------------------


def test_permute_csr_matches_dense(rng):
    from tpusparse import permute_csr

    a = random_csr(20, (24, 30), 0.2)
    p = rng.permutation(24)
    q = rng.permutation(30)
    out = permute_csr(a, p, q)
    d = np.asarray(a.to_dense())
    np.testing.assert_array_equal(np.asarray(out.to_dense()), d[p][:, q])
    # rows only / cols only
    np.testing.assert_array_equal(
        np.asarray(permute_csr(a, row_perm=p).to_dense()), d[p]
    )
    np.testing.assert_array_equal(
        np.asarray(permute_csr(a, col_perm=q).to_dense()), d[:, q]
    )
    # sorted indices preserved
    rows = out.row_ids()
    flat = np.asarray(rows) * 30 + np.asarray(out.indices)
    assert (np.diff(flat) > 0).all()


def test_permute_csr_differentiable(rng):
    from tpusparse import permute_csr

    a = random_csr(21, (12, 12), 0.3)
    p = rng.permutation(12)

    def f(data):
        return (permute_csr(CSR(data, a.indices, a.indptr, a.shape), p, p).data ** 2).sum()

    check_grads(f, (a.data,), **GRAD_KW)


def test_permute_csr_rejects_non_permutation():
    from tpusparse import permute_csr

    a = random_csr(22, (8, 8), 0.3)
    with pytest.raises(ValueError, match="row_perm"):
        permute_csr(a, np.zeros(8, np.int64))
    with pytest.raises(ValueError, match="col_perm"):
        permute_csr(a, None, np.array([0] * 8))


# ---- constructors: kron / tril / triu ----


def _sc(m):
    m = m.tocsr().astype(np.float32)
    m.sort_indices()
    return CSR.from_scipy(m)


def test_sp_kron_matches_scipy():
    a = ssp.random(13, 17, density=0.2, format="csr", random_state=1)
    b = ssp.random(7, 5, density=0.3, format="csr", random_state=2)
    k = ts.sp_kron(_sc(a), _sc(b))
    ref = ssp.kron(a, b, format="csr")
    ref.sort_indices()
    np.testing.assert_allclose(
        np.asarray(k.to_dense()), ref.toarray(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(k.indices), ref.indices)
    np.testing.assert_array_equal(np.asarray(k.indptr), ref.indptr)


def test_sp_kron_grads_both_operands():
    a = _sc(ssp.random(6, 6, density=0.4, format="csr", random_state=3))
    b = _sc(ssp.random(4, 4, density=0.5, format="csr", random_state=4))

    def f(da, db):
        k = ts.sp_kron(
            CSR(da, a.indices, a.indptr, a.shape),
            CSR(db, b.indices, b.indptr, b.shape),
        )
        return (k.data**2).sum()

    jax.test_util.check_grads(f, (a.data, b.data), order=1, modes=("rev",))


def test_sp_tril_triu_match_scipy():
    a = ssp.random(11, 9, density=0.35, format="csr", random_state=5)
    for k in (-3, -1, 0, 1, 4):
        np.testing.assert_allclose(
            np.asarray(ts.sp_tril(_sc(a), k).to_dense()),
            ssp.tril(a, k).toarray(),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ts.sp_triu(_sc(a), k).to_dense()),
            ssp.triu(a, k).toarray(),
            rtol=1e-6,
        )


def test_tril_triu_partition():
    a = _sc(ssp.random(16, 16, density=0.3, format="csr", random_state=6))
    lo = ts.sp_tril(a, -1)
    up = ts.sp_triu(a, 0)
    back = ts.sp_add(lo, up)
    np.testing.assert_allclose(
        np.asarray(back.to_dense()), np.asarray(a.to_dense()), rtol=1e-6
    )
