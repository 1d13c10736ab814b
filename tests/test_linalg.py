"""Iterative solvers / spectral tools vs scipy fp64 oracles.

No reference analog (the reference stops at the matmul layer) — these
validate that the framework's SpMM composes correctly under lax loops
(Krylov solvers, power iteration, LOBPCG) and that the triangular scan
solve is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as ssp
import scipy.sparse.linalg as sla

from tpusparse import CSR, random_csr, sp_add, transpose_csr
from tpusparse import linalg


def _spd(seed, n=96, density=0.05, boost=None):
    """Diagonally-dominant symmetric CSR (hence SPD)."""
    b = random_csr(seed, (n, n), density)
    s = sp_add(b, transpose_csr(b))  # symmetric, union pattern
    return sp_add(s, linalg.speye(n), 1.0, boost or (2.0 * n * density + 1.0))


def _to_scipy64(a):
    return a.to_scipy().astype(np.float64)


def test_speye():
    i = linalg.speye(5)
    np.testing.assert_array_equal(np.asarray(i.to_dense()), np.eye(5, dtype=np.float32))


def test_diagonal(rng):
    a = random_csr(1, (32, 32), 0.1)
    d = linalg.diagonal(a)
    np.testing.assert_allclose(
        np.asarray(d), np.diag(np.asarray(a.to_dense())), rtol=1e-6
    )


def test_diagonal_is_differentiable():
    a = random_csr(2, (16, 16), 0.2)
    g = jax.grad(lambda v: jnp.sum(linalg.diagonal(CSR(v, a.indices, a.indptr, a.shape)) ** 2))(a.data)
    assert g.shape == a.data.shape
    # gradient is 2*diag value at stored diagonal slots, 0 elsewhere
    rows = np.asarray(a.row_ids())
    on_diag = rows == np.asarray(a.indices)
    np.testing.assert_allclose(
        np.asarray(g)[on_diag], 2 * np.asarray(a.data)[on_diag], rtol=1e-6
    )
    assert (np.asarray(g)[~on_diag] == 0).all()


def test_cg_solves_spd(rng):
    a = _spd(3)
    b = jnp.asarray(rng.random((96,), dtype=np.float32))
    x, _ = linalg.cg(a, b, tol=1e-6, maxiter=500)
    ref = sla.spsolve(_to_scipy64(a).tocsc(), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x, np.float64), ref, rtol=1e-3, atol=1e-4)


def test_cg_jacobi_preconditioned(rng):
    a = _spd(4)
    b = jnp.asarray(rng.random((96,), dtype=np.float32))
    M = linalg.jacobi_preconditioner(a)
    x, _ = linalg.cg(a, b, tol=1e-6, maxiter=500, M=M)
    ref = sla.spsolve(_to_scipy64(a).tocsc(), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x, np.float64), ref, rtol=1e-3, atol=1e-4)


def test_cg_under_jit(rng):
    a = _spd(5)
    b = jnp.asarray(rng.random((96,), dtype=np.float32))

    @jax.jit
    def solve(bv):
        return linalg.cg(a, bv, tol=1e-6, maxiter=300)[0]

    ref = sla.spsolve(_to_scipy64(a).tocsc(), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(solve(b), np.float64), ref, rtol=1e-3, atol=1e-4)


def test_bicgstab_nonsymmetric(rng):
    a = sp_add(random_csr(6, (64, 64), 0.08), linalg.speye(64), 1.0, 8.0)
    b = jnp.asarray(rng.random((64,), dtype=np.float32))
    x, _ = linalg.bicgstab(a, b, tol=1e-7, maxiter=800)
    ref = sla.spsolve(_to_scipy64(a).tocsc(), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x, np.float64), ref, rtol=1e-2, atol=1e-3)


def test_gmres_nonsymmetric(rng):
    a = sp_add(random_csr(7, (64, 64), 0.08), linalg.speye(64), 1.0, 8.0)
    b = jnp.asarray(rng.random((64,), dtype=np.float32))
    x, _ = linalg.gmres(a, b, tol=1e-7, restart=32, maxiter=200)
    ref = sla.spsolve(_to_scipy64(a).tocsc(), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x, np.float64), ref, rtol=1e-2, atol=1e-3)


def test_power_iteration_matches_scipy():
    a = _spd(8, n=64, density=0.08)
    lam, v = linalg.power_iteration(a, iters=300)
    ref = sla.eigsh(_to_scipy64(a), k=1, which="LM")[0][0]
    np.testing.assert_allclose(float(lam), ref, rtol=1e-3)
    # eigenvector residual
    res = np.asarray(a.to_dense(), np.float64) @ np.asarray(v, np.float64)
    np.testing.assert_allclose(res, float(lam) * np.asarray(v, np.float64), atol=1e-2)


def test_lobpcg_topk():
    a = _spd(9, n=128, density=0.05)
    k = 3
    theta, U, _ = linalg.lobpcg_topk(a, k=k, iters=200)
    ref = np.sort(sla.eigsh(_to_scipy64(a), k=k, which="LA")[0])[::-1]
    np.testing.assert_allclose(np.sort(np.asarray(theta))[::-1], ref, rtol=1e-3)
    assert U.shape == (128, k)


def test_lower_triangular_solve(rng):
    n = 48
    dense = np.tril(rng.random((n, n), dtype=np.float32))
    dense[dense < 0.7] = 0.0
    np.fill_diagonal(dense, rng.random(n, dtype=np.float32) + 1.0)
    a = CSR.from_dense(jnp.asarray(dense))
    b = rng.random((n,), dtype=np.float32)
    x = linalg.spsolve_lower_triangular(a, jnp.asarray(b))
    ref = sla.spsolve_triangular(
        ssp.csr_matrix(dense.astype(np.float64)), b.astype(np.float64), lower=True
    )
    np.testing.assert_allclose(np.asarray(x, np.float64), ref, rtol=1e-4, atol=1e-5)


def test_lower_triangular_rejects_upper_entries():
    a = random_csr(10, (16, 16), 0.3)  # almost surely has upper entries
    with pytest.raises(ValueError, match="above the diagonal"):
        linalg.spsolve_lower_triangular(a, jnp.ones(16))


def test_matvec_shape_guard():
    a = random_csr(11, (8, 12), 0.3)
    with pytest.raises(ValueError, match="square"):
        linalg.as_matvec(a)
