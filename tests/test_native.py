"""Native C++ inspector parity vs the numpy reference implementation.

The native path (csrc/inspector.cpp via ctypes) is the analog of the
reference's OpenMP host inspector (src/sparse_mm.cu:137-368); it must be
bit-identical to plan._inspect_numpy.
"""

import numpy as np
import pytest

from tpusparse import random_csr
from tpusparse.plan import _inspect_numpy, build_plan, clear_plan_cache
from tpusparse.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native inspector not built"
)


@pytest.mark.parametrize(
    "shape,density,blocksize",
    [
        ((128, 96), 0.1, (8, 16)),
        ((1000, 777), 0.03, (16, 128)),
        ((64, 64), 0.5, (8, 8)),
        ((50, 70), 0.08, (16, 16)),  # ragged dims
        ((256, 256), 0.001, (8, 128)),  # ultra sparse
    ],
)
def test_native_matches_numpy(shape, density, blocksize):
    a = random_csr(hash((shape, density)) % 1000, shape, density)
    ip, ix = np.asarray(a.indptr), np.asarray(a.indices)
    ref = _inspect_numpy(ip, ix, shape, blocksize)
    out = native.inspect(ip, ix, shape, blocksize)
    for r, o, name in zip(ref, out, ["block_cols", "nslots", "scatter", "L", "nb"]):
        if isinstance(r, np.ndarray):
            np.testing.assert_array_equal(o, r, err_msg=name)
        else:
            assert o == r, name


def test_native_used_by_build_plan(monkeypatch):
    # build_plan must route through the native inspector when available
    calls = {"n": 0}
    orig = native.inspect

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(native, "inspect", counting)
    clear_plan_cache()
    a = random_csr(99, (64, 64), 0.1)
    build_plan(a, blocksize=(8, 16))
    assert calls["n"] == 1


def test_empty_pattern():
    import jax.numpy as jnp

    from tpusparse import CSR

    a = CSR(
        data=jnp.zeros((0,), jnp.float32),
        indices=np.zeros((0,), np.int32),
        indptr=np.zeros((17,), np.int32),
        shape=(16, 32),
    )
    ip, ix = np.asarray(a.indptr), np.asarray(a.indices)
    ref = _inspect_numpy(ip, ix, a.shape, (8, 16))
    out = native.inspect(ip, ix, a.shape, (8, 16))
    assert out[3] == ref[3] == 1
    np.testing.assert_array_equal(out[1], ref[1])


def test_native_aggregate_matches_python(monkeypatch):
    import scipy.sparse as ssp

    from tpusparse.amg import _aggregate, _strength_graph

    if not native.available():
        pytest.skip("native runtime unavailable")
    n1 = 30
    T = ssp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n1, n1), format="csr")
    I = ssp.eye(n1, format="csr")
    a = (ssp.kron(I, T) + ssp.kron(T, I)).tocsr()
    a.sort_indices()
    rows, strong = _strength_graph(a.indptr, a.indices, a.data, 0.08)
    agg_nat, k_nat = native.aggregate(a.indptr, a.indices, strong)
    monkeypatch.setenv("TPUSPARSE_NO_NATIVE", "1")
    agg_py, k_py = _aggregate(a.indptr, a.indices, rows, strong, a.shape[0])
    assert k_nat == k_py
    np.testing.assert_array_equal(agg_nat, agg_py)
    # every node aggregated, ids dense in [0, n_agg)
    assert agg_nat.min() == 0 and agg_nat.max() == k_nat - 1
    assert set(np.unique(agg_nat)) == set(range(k_nat))
