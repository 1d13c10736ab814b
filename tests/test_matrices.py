"""Real-matrix harness tests: Matrix Market round-trip + catalog stand-ins.

Upgrades the reference's synthesized-fixture role
(tests/cusparse_kernel_test.py:13-30) to real-matrix ingestion
(BASELINE configs[4] "SuiteSparse matrices").
"""

import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse import CSR, spmm_reference
from tpusparse.types import csr_to_dia
from tpusparse.utils.matrices import (
    MATRIX_CATALOG,
    describe,
    find_mtx,
    generate,
    get_matrix,
    load_mtx,
    save_mtx,
)


def test_mtx_roundtrip(tmp_path, rng):
    a_sp = sp.random(64, 48, 0.1, format="csr", random_state=np.random.RandomState(3))
    a = CSR.from_scipy(a_sp.astype(np.float32))
    p = str(tmp_path / "m.mtx")
    save_mtx(p, a)
    back = load_mtx(p)
    assert back.shape == a.shape
    np.testing.assert_allclose(
        back.to_scipy().toarray(), a_sp.toarray(), rtol=1e-6, atol=1e-7
    )


def test_mtx_gz_roundtrip(tmp_path):
    a_sp = sp.random(32, 32, 0.2, format="csr", random_state=np.random.RandomState(5))
    a = CSR.from_scipy(a_sp.astype(np.float32))
    p = str(tmp_path / "m.mtx.gz")
    save_mtx(p, a)
    back = load_mtx(p)
    np.testing.assert_allclose(
        back.to_scipy().toarray(), a_sp.toarray(), rtol=1e-6, atol=1e-7
    )


def test_mtx_symmetric_expansion(tmp_path):
    # write symmetric storage by hand; reader must expand to full pattern
    p = tmp_path / "sym.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 4\n"
        "1 1 2.0\n"
        "2 1 -1.0\n"
        "2 2 2.0\n"
        "3 3 2.0\n"
    )
    a = load_mtx(str(p))
    d = a.to_scipy().toarray()
    np.testing.assert_allclose(
        d, [[2, -1, 0], [-1, 2, 0], [0, 0, 2]], rtol=0, atol=0
    )


def test_mtx_pattern_field(tmp_path):
    p = tmp_path / "pat.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "2 2 2\n"
        "1 2\n"
        "2 1\n"
    )
    a = load_mtx(str(p))
    np.testing.assert_allclose(a.to_scipy().toarray(), [[0, 1], [1, 0]])


@pytest.mark.parametrize(
    "name", ["laplace2d_256", "powerlaw_16k", "circuit_50k", "blocked_4k"]
)
def test_catalog_classes(name):
    a = generate(name)
    m, n = a.shape
    assert m == n and a.nnz > 0
    assert describe(name)
    entry = MATRIX_CATALOG[name]
    s = a.to_scipy()
    if entry.pattern_class.startswith("banded"):
        dia = csr_to_dia(a)
        assert dia.noffsets <= 7  # stencils stay DIA-friendly
    if entry.pattern_class == "power-law graph":
        deg = np.diff(np.asarray(a.indptr))
        # genuine skew: top row degree dwarfs the median
        assert deg.max() > 20 * np.median(deg)
        assert ((s - s.T).nnz == 0)  # symmetric
    if entry.pattern_class == "circuit":
        deg = np.diff(np.asarray(a.indptr))
        assert deg.max() > 1000  # dense rail rows
        d = s.diagonal()
        offsum = np.abs(s).sum(axis=1).A1 - np.abs(d)
        assert (d > offsum).all()  # diagonally dominant


def test_catalog_determinism():
    a = generate("powerlaw_16k")
    b = generate("powerlaw_16k")
    assert (a.to_scipy() != b.to_scipy()).nnz == 0


def test_get_matrix_cache_roundtrip(tmp_path):
    cache = str(tmp_path)
    a = get_matrix("blocked_4k", search_dirs=[cache], cache_dir=cache)
    assert find_mtx("blocked_4k", [cache]) is not None
    b = get_matrix("blocked_4k", search_dirs=[cache])  # reader path now
    assert (a.to_scipy() != b.to_scipy()).nnz == 0


def test_get_matrix_unknown():
    with pytest.raises(KeyError, match="catalog"):
        get_matrix("no_such_matrix", search_dirs=["/nonexistent"])


def test_catalog_matrix_spmm_correctness(rng):
    # the harness output must be a valid operand for the op surface
    a = generate("blocked_4k")
    b = rng.standard_normal((a.shape[1], 8)).astype(np.float32)
    out = np.asarray(spmm_reference(a, b))
    ref = a.to_scipy().astype(np.float64) @ b.astype(np.float64)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4
