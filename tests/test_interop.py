"""Interop round-trips: torch / scipy / jax.experimental.sparse ⇄ tpusparse.

The reference's only interop is extracting CSR properties from torch
sparse tensors per call (matmuls.py:178-187); here conversion is a
one-time boundary step, checked by dense round-trip equality.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as ssp

from tpusparse import BSR, COO, CSR, random_csr
from tpusparse import interop

torch = pytest.importorskip("torch")


def _dense(a):
    return np.asarray(a.to_dense(), np.float64)


@pytest.fixture
def mat(rng):
    d = rng.random((24, 36), dtype=np.float32)
    d[d < 0.8] = 0.0
    return d


# --- torch ------------------------------------------------------------------


def test_torch_dense_roundtrip(mat):
    a = interop.from_torch(torch.from_numpy(mat))
    assert isinstance(a, CSR)
    np.testing.assert_array_equal(_dense(a), mat.astype(np.float64))


def test_torch_csr_roundtrip(mat):
    t = torch.from_numpy(mat).to_sparse_csr()
    a = interop.from_torch(t)
    assert isinstance(a, CSR)
    np.testing.assert_array_equal(_dense(a), mat.astype(np.float64))
    back = interop.to_torch(a)
    assert back.layout == torch.sparse_csr
    np.testing.assert_array_equal(back.to_dense().numpy(), mat)


def test_torch_coo_roundtrip(mat):
    t = torch.from_numpy(mat).to_sparse_coo()
    a = interop.from_torch(t)
    assert isinstance(a, COO)
    np.testing.assert_array_equal(_dense(a), mat.astype(np.float64))
    back = interop.to_torch(a)
    assert back.layout == torch.sparse_coo
    np.testing.assert_array_equal(back.to_dense().numpy(), mat)


def test_torch_bsr_roundtrip(mat):
    t = torch.from_numpy(mat).to_sparse_bsr((4, 6))
    a = interop.from_torch(t)
    assert isinstance(a, BSR)
    assert a.blocksize == (4, 6)
    np.testing.assert_array_equal(_dense(a), mat.astype(np.float64))
    back = interop.to_torch(a)
    assert back.layout == torch.sparse_bsr
    np.testing.assert_array_equal(back.to_dense().numpy(), mat)


def test_torch_rejects_bad_inputs(mat):
    with pytest.raises(TypeError):
        interop.from_torch(mat)  # numpy, not torch
    with pytest.raises(ValueError):
        interop.from_torch(torch.zeros(2, 3, 4))
    # unpadded logical shape -> torch BSR refused with guidance
    b = BSR.from_dense(jnp.asarray(mat[:22, :34]), (4, 6))
    with pytest.raises(ValueError, match="block multiple"):
        interop.to_torch(b)


def test_torch_user_flow_spmm(mat, rng):
    """The migration story: torch CSR in, tpusparse spmm out."""
    from tpusparse import spmm

    a = interop.from_torch(torch.from_numpy(mat).to_sparse_csr())
    x = rng.random((36, 8), dtype=np.float32)
    y = spmm(a, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y, np.float64),
        mat.astype(np.float64) @ x.astype(np.float64),
        rtol=1e-4,
        atol=1e-5,
    )


# --- scipy ------------------------------------------------------------------


@pytest.mark.parametrize("fmt", ["csr", "csc", "coo", "bsr"])
def test_scipy_roundtrip(mat, fmt):
    sp = (
        ssp.bsr_matrix(mat, blocksize=(4, 6))
        if fmt == "bsr"
        else ssp.csr_matrix(mat).asformat(fmt)
    )
    a = interop.from_scipy(sp)
    np.testing.assert_array_equal(_dense(a), mat.astype(np.float64))
    back = interop.to_scipy(a)
    np.testing.assert_array_equal(back.toarray(), mat)


def test_to_scipy_rejects_unknown():
    with pytest.raises(TypeError):
        interop.to_scipy(np.zeros((2, 2)))


# --- jax.experimental.sparse -------------------------------------------------


def test_bcoo_roundtrip(mat):
    from jax.experimental import sparse as jsparse

    m = jsparse.BCOO.fromdense(jnp.asarray(mat))
    a = interop.from_bcoo(m)
    assert isinstance(a, COO)
    np.testing.assert_array_equal(_dense(a), mat.astype(np.float64))
    back = interop.to_bcoo(a)
    np.testing.assert_array_equal(np.asarray(back.todense()), mat)


def test_bcsr_roundtrip(mat):
    from jax.experimental import sparse as jsparse

    m = jsparse.BCSR.fromdense(jnp.asarray(mat))
    a = interop.from_bcsr(m)
    assert isinstance(a, CSR)
    np.testing.assert_array_equal(_dense(a), mat.astype(np.float64))
    back = interop.to_bcsr(a)
    np.testing.assert_array_equal(np.asarray(back.todense()), mat)


def test_to_bcoo_from_csr():
    a = random_csr(3, (32, 48), 0.1)
    back = interop.to_bcoo(a)
    np.testing.assert_array_equal(np.asarray(back.todense()), np.asarray(a.to_dense()))


def test_bcoo_rejects_batched(mat):
    from jax.experimental import sparse as jsparse

    m = jsparse.BCOO.fromdense(jnp.asarray(mat)[None], n_batch=1)
    with pytest.raises(ValueError):
        interop.from_bcoo(m)
