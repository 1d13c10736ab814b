"""Sparse container tests: conversions round-trip vs scipy, reference ops.

Oracle strategy follows the reference (golden comparison against a dense
library, SURVEY.md §4) but uses scipy/numpy on CPU and seeds everything.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as ssp

from tpusparse import (
    COO,
    CSR,
    BSR,
    coo_to_csr,
    csr_to_coo,
    csr_to_bsr,
    bsr_to_csr,
    random_csr,
    random_coo,
    spmm_reference,
    sddmm_reference,
)

SHAPES = [(16, 16), (32, 64), (64, 32), (128, 96)]


def _rand_dense(rng, shape, density=0.2):
    mat = rng.random(shape, dtype=np.float32)
    mask = rng.random(shape) < density
    return (mat * mask).astype(np.float32)


@pytest.mark.parametrize("shape", SHAPES)
def test_coo_roundtrip(rng, shape):
    mat = _rand_dense(rng, shape)
    coo = COO.from_dense(mat)
    np.testing.assert_array_equal(np.asarray(coo.to_dense()), mat)
    assert coo.nnz == int((mat != 0).sum())


@pytest.mark.parametrize("shape", SHAPES)
def test_csr_roundtrip_vs_scipy(rng, shape):
    mat = _rand_dense(rng, shape)
    csr = CSR.from_dense(mat)
    sp = ssp.csr_matrix(mat)
    np.testing.assert_array_equal(np.asarray(csr.indices), sp.indices)
    np.testing.assert_array_equal(np.asarray(csr.indptr), sp.indptr)
    np.testing.assert_allclose(np.asarray(csr.data), sp.data)
    np.testing.assert_array_equal(np.asarray(csr.to_dense()), mat)


@pytest.mark.parametrize("shape", SHAPES)
def test_coo_csr_conversions(rng, shape):
    mat = _rand_dense(rng, shape)
    coo = COO.from_dense(mat)
    csr = coo_to_csr(coo)
    np.testing.assert_array_equal(np.asarray(csr.to_dense()), mat)
    back = csr_to_coo(csr)
    np.testing.assert_array_equal(np.asarray(back.to_dense()), mat)


def test_csr_transpose(rng):
    mat = _rand_dense(rng, (48, 80))
    csr = CSR.from_dense(mat)
    np.testing.assert_allclose(np.asarray(csr.T.to_dense()), mat.T)
    # jittable
    t = jax.jit(lambda a: a.T)(csr)
    np.testing.assert_allclose(np.asarray(t.to_dense()), mat.T)


@pytest.mark.parametrize("blocksize", [(8, 8), (8, 16), (16, 8)])
def test_bsr_roundtrip(rng, blocksize):
    mat = _rand_dense(rng, (40, 72), density=0.05)
    bsr = BSR.from_dense(mat, blocksize)
    np.testing.assert_array_equal(np.asarray(bsr.to_dense()), mat)
    csr = bsr_to_csr(bsr)
    np.testing.assert_array_equal(np.asarray(csr.to_dense()), mat)
    bsr2 = csr_to_bsr(CSR.from_dense(mat), blocksize)
    np.testing.assert_array_equal(np.asarray(bsr2.to_dense()), mat)


def test_random_fixtures_exact_nnz():
    csr = random_csr(0, (64, 64), 0.1)
    assert csr.nnz == int(round(0.1 * 64 * 64))
    coo = random_coo(1, (32, 48), 0.25)
    assert coo.nnz == int(round(0.25 * 32 * 48))
    # deterministic per key
    a = random_csr(7, (32, 32), 0.2)
    b = random_csr(7, (32, 32), 0.2)
    np.testing.assert_array_equal(np.asarray(a.indices), np.asarray(b.indices))
    np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data))


@pytest.mark.parametrize(
    "shape_a,ncols",
    [((64, 64), 32), ((64, 128), 48), ((128, 64), 256), ((512, 1024), 256)],
)
def test_spmm_reference_vs_scipy(rng, shape_a, ncols):
    # Mirrors the reference cuSPARSE test grid at ~10% density
    # (tests/cusparse_kernel_test.py:32-46) with a scipy oracle.
    mat = _rand_dense(rng, shape_a, density=0.1)
    b = rng.random((shape_a[1], ncols), dtype=np.float32)
    csr = CSR.from_dense(mat)
    out = spmm_reference(csr, jnp.asarray(b))
    expected = ssp.csr_matrix(mat) @ b
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min", "mul"])
def test_spmm_reference_reducers(rng, reduce):
    # Reduction-mode parity with the reference Reducer library
    # (src/naive_reducer.cuh:23-46).
    mat = _rand_dense(rng, (32, 32), density=0.3)
    b = rng.random((32, 16), dtype=np.float32)
    csr = CSR.from_dense(mat)
    out = np.asarray(spmm_reference(csr, jnp.asarray(b), reduce=reduce))

    contrib = mat[:, :, None] * b[None, :, :]  # (m, k, n)
    mask = (mat != 0)[:, :, None]
    if reduce == "sum":
        expected = np.where(mask, contrib, 0).sum(axis=1)
    elif reduce == "mean":
        cnt = np.maximum(mask.sum(axis=1), 1)
        expected = np.where(mask, contrib, 0).sum(axis=1) / cnt
    elif reduce == "max":
        expected = np.where(mask, contrib, -np.inf).max(axis=1)
    elif reduce == "min":
        expected = np.where(mask, contrib, np.inf).min(axis=1)
    else:
        expected = np.where(mask, contrib, 1.0).prod(axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_sddmm_reference(rng):
    m, k, n = 48, 32, 40
    pat = _rand_dense(rng, (m, n), density=0.15)
    x = rng.random((m, k), dtype=np.float32)
    y = rng.random((k, n), dtype=np.float32)
    csr = CSR.from_dense(pat)
    vals = np.asarray(sddmm_reference(csr, jnp.asarray(x), jnp.asarray(y)))
    dense = x @ y
    rows, cols = np.asarray(csr.row_ids()), np.asarray(csr.indices)
    np.testing.assert_allclose(vals, dense[rows, cols], rtol=1e-5, atol=1e-5)


def test_pytree_jit_stability():
    csr = random_csr(0, (32, 32), 0.1)
    calls = 0

    @jax.jit
    def f(a, b):
        nonlocal calls
        calls += 1
        return spmm_reference(a, b)

    b = jnp.ones((32, 8))
    f(csr, b)
    # same pattern, new values: no retrace
    csr2 = CSR(csr.data * 2, csr.indices, csr.indptr, csr.shape)
    f(csr2, b)
    assert calls == 1


def test_coo_to_csr_unsorted_native_and_xla(rng):
    """coo_to_csr handles unsorted COO; native and XLA paths agree."""
    import scipy.sparse as sp
    import tpusparse as ts

    from tpusparse.runtime import native

    nnz, m, n = 2000, 150, 200
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.random(nnz).astype(np.float32)
    coo = ts.COO(data=jnp.asarray(vals), row=rows, col=cols, shape=(m, n))
    csr = ts.coo_to_csr(coo)
    ref = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    got = sp.csr_matrix(
        (np.asarray(csr.data), np.asarray(csr.indices), np.asarray(csr.indptr)),
        shape=(m, n),
    )
    assert np.abs((got - ref).toarray()).max() < 1e-6

    if native.available():
        indptr, order = native.coo_to_csr(rows, m)
        np.testing.assert_array_equal(indptr, np.asarray(csr.indptr))
        # stability: within a row, original order preserved
        assert (np.diff(order[indptr[0] : indptr[1]]) > 0).all() or indptr[1] - indptr[0] <= 1


def test_plan_save_load_roundtrip(tmp_path, rng):
    import tpusparse as ts

    from tpusparse.kernels.tiled_spmm import tiled_spmm_pallas
    from tpusparse.plan import build_plan, load_plan, save_plan

    a = ts.random_csr(0, (128, 160), 0.05)
    plan = build_plan(a, blocksize=(8, 32))
    path = str(tmp_path / "plan.npz")
    save_plan(plan, path)
    plan2 = load_plan(path)
    assert plan2.shape == plan.shape
    assert plan2.blocksize == plan.blocksize
    assert plan2.ell_width == plan.ell_width
    b = jnp.asarray(rng.normal(size=(160, 64)).astype(np.float32))
    out1 = np.asarray(tiled_spmm_pallas(plan, plan.pack_values(a.data), b))
    out2 = np.asarray(tiled_spmm_pallas(plan2, plan2.pack_values(a.data), b))
    np.testing.assert_allclose(out1, out2)


def test_to_dense_unsorted_columns(rng):
    """Within-row column order is not a CSR invariant (coo_to_csr keeps
    COO column order); to_dense must not promise sortedness to the
    scatter in that case."""
    import tpusparse as ts

    coo = ts.random_coo(50, (32, 48), 0.1)
    # shuffle the nnz order so columns within a row are unsorted
    perm = rng.permutation(coo.row.shape[0])
    shuffled = ts.COO(
        data=jnp.asarray(np.asarray(coo.data)[perm]),
        row=jnp.asarray(np.asarray(coo.row)[perm]),
        col=jnp.asarray(np.asarray(coo.col)[perm]),
        shape=coo.shape,
    )
    csr = ts.coo_to_csr(shuffled)
    dense = np.zeros(coo.shape, np.float32)
    dense[np.asarray(coo.row), np.asarray(coo.col)] = np.asarray(coo.data)
    np.testing.assert_allclose(np.asarray(csr.to_dense()), dense, rtol=1e-6)


def test_spmm_reference_minmax_empty_rows_zero(rng):
    """Empty rows yield 0 under min/max (reference Reducer::write
    count==0 contract), not the segment identity ±inf — and the plain
    and return_arg branches must agree."""
    import tpusparse as ts

    mat = np.zeros((6, 8), np.float32)
    mat[1, 2] = -3.0
    mat[4, [1, 5]] = [2.0, -1.0]
    a = ts.CSR.from_dense(mat)
    b = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    for reduce in ("max", "min"):
        vals = np.asarray(ts.spmm_reference(a, b, reduce=reduce))
        vals2, _ = ts.spmm_reference(a, b, reduce=reduce, return_arg=True)
        assert np.isfinite(vals).all()
        np.testing.assert_allclose(vals, np.asarray(vals2), rtol=1e-6)
        for i in (0, 2, 3, 5):  # empty rows
            np.testing.assert_array_equal(vals[i], 0.0)


# ---------------------------------------------------------------------------
# Operator sugar on CSR (thin wrappers over the public op surface)
# ---------------------------------------------------------------------------


def test_csr_operators(rng):
    import jax.numpy as jnp
    from tpusparse import random_csr

    a = random_csr(30, (16, 24), 0.2)
    b = random_csr(31, (16, 24), 0.2)
    c = random_csr(32, (24, 12), 0.2)
    x = jnp.asarray(rng.random((24, 8), dtype=np.float32))
    y = jnp.asarray(rng.random((4, 16), dtype=np.float32))
    ad = np.asarray(a.to_dense(), np.float64)
    bd = np.asarray(b.to_dense(), np.float64)
    cd = np.asarray(c.to_dense(), np.float64)

    np.testing.assert_allclose(
        np.asarray(a @ x), ad @ np.asarray(x, np.float64), rtol=1e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(y @ a), np.asarray(y, np.float64) @ ad, rtol=1e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray((a @ c).to_dense()), ad @ cd, rtol=1e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray((a + b).to_dense()), ad + bd, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray((a - b).to_dense()), ad - bd, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray((a * b).to_dense()), ad * bd, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray((2.0 * a).to_dense()), 2.0 * ad)
    np.testing.assert_allclose(np.asarray((a * 2.0).to_dense()), 2.0 * ad)
    np.testing.assert_allclose(np.asarray((-a).to_dense()), -ad)


def test_csr_mul_dense_array_rejected():
    from tpusparse import random_csr

    a = random_csr(33, (8, 8), 0.2)
    with pytest.raises(TypeError):
        a * np.ones((8, 8))  # dense broadcast would silently densify


def test_spmm_accepts_coo(rng):
    import jax.numpy as jnp
    from tpusparse import random_coo, spmm

    a = random_coo(34, (32, 48), 0.1)
    x = jnp.asarray(rng.random((48, 8), dtype=np.float32))
    out = spmm(a, x, method="gather")
    ref = np.asarray(a.to_dense(), np.float64) @ np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=5e-5)


def test_csr_to_bsr_no_densify_scale(rng):
    # a 200K-row matrix: the direct pattern pass must stay O(nnz); the
    # old dense round-trip would have allocated 200000^2 floats
    import scipy.sparse as sp

    m = 200_000
    r = np.random.default_rng(9)
    nnz = 800_000
    a_sp = sp.coo_matrix(
        (
            r.random(nnz).astype(np.float32) + 0.5,
            (r.integers(0, m, nnz), r.integers(0, m, nnz)),
        ),
        shape=(m, m),
    ).tocsr()
    a_sp.sum_duplicates()
    a = CSR.from_scipy(a_sp)
    bsr = csr_to_bsr(a, (8, 8))
    assert bsr.nblocks <= a_sp.nnz  # each nnz lands in exactly one block
    back = bsr_to_csr(bsr)
    b_sp = back.to_scipy()
    assert (b_sp != a_sp).nnz == 0


def test_bsr_csr_roundtrip_small(rng):
    mat = np.zeros((20, 26), np.float32)
    mat[1, 3] = 2.0
    mat[9, 25] = -1.5
    mat[19, 0] = 4.0
    a = CSR.from_dense(mat)
    bsr = csr_to_bsr(a, (8, 16))
    np.testing.assert_allclose(np.asarray(bsr.to_dense()), mat)
    back = bsr_to_csr(bsr)
    np.testing.assert_allclose(np.asarray(back.to_dense()), mat)


def test_bsr_from_dense_matches_conversion(rng):
    mat = (rng.random((40, 56)) * (rng.random((40, 56)) < 0.05)).astype(np.float32)
    b1 = BSR.from_dense(mat, (8, 8))
    b2 = csr_to_bsr(CSR.from_dense(mat), (8, 8))
    np.testing.assert_allclose(np.asarray(b1.to_dense()), mat)
    np.testing.assert_allclose(
        np.asarray(b1.to_dense()), np.asarray(b2.to_dense())
    )
    assert b1.nblocks == b2.nblocks
