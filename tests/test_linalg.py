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


# ---------------------------------------------------------------------------
# upper triangular solve, ILU(0)/IC(0) preconditioning
# ---------------------------------------------------------------------------


def test_upper_triangular_solve(rng):
    n = 48
    dense = np.triu(rng.random((n, n), dtype=np.float32))
    dense[dense < 0.7] = 0.0
    np.fill_diagonal(dense, rng.random(n, dtype=np.float32) + 1.0)
    a = CSR.from_dense(jnp.asarray(dense))
    b = rng.random((n,), dtype=np.float32)
    x = linalg.spsolve_upper_triangular(a, jnp.asarray(b))
    ref = sla.spsolve_triangular(
        ssp.csr_matrix(dense.astype(np.float64)), b.astype(np.float64), lower=False
    )
    np.testing.assert_allclose(np.asarray(x, np.float64), ref, rtol=1e-4, atol=1e-5)


def test_upper_triangular_rejects_lower_entries():
    a = random_csr(12, (16, 16), 0.3)
    with pytest.raises(ValueError, match="below the diagonal"):
        linalg.spsolve_upper_triangular(a, jnp.ones(16))


def _ilu0_dense_reference(dense):
    """fp64 dense ILU(0): Gaussian elimination with updates restricted to
    the original pattern."""
    a = dense.astype(np.float64).copy()
    pattern = dense != 0
    n = a.shape[0]
    for i in range(1, n):
        for k in range(i):
            if not pattern[i, k]:
                continue
            a[i, k] /= a[k, k]
            for j in range(k + 1, n):
                if pattern[i, j]:
                    a[i, j] -= a[i, k] * a[k, j]
    return a


def _with_diagonal(seed, n=40, density=0.12):
    a = random_csr(seed, (n, n), density)
    return sp_add(a, linalg.speye(n), 1.0, 2.0 + n * density)


def test_ilu0_matches_dense_reference():
    n = 40
    a = _with_diagonal(13, n)
    L, U = linalg.ilu0(a)
    combined = _ilu0_dense_reference(np.asarray(a.to_dense(), np.float64))
    got = (
        np.asarray(L.to_dense(), np.float64)
        + np.asarray(U.to_dense(), np.float64)
    )
    mask = np.asarray(a.to_scipy().astype(bool).todense())
    np.testing.assert_allclose(got[mask], combined[mask], rtol=1e-5, atol=1e-6)
    # L strict lower, U upper with full diagonal
    assert np.all(np.triu(np.asarray(L.to_dense())) == 0)
    assert np.all(np.tril(np.asarray(U.to_dense()), -1) == 0)
    assert np.all(np.diag(np.asarray(U.to_dense())) != 0)


def test_ilu0_numpy_fallback_matches_native(monkeypatch):
    from tpusparse.runtime import native

    a = _with_diagonal(14, 32)
    if not native.available():
        pytest.skip("no native toolchain")
    L1, U1 = linalg.ilu0(a)
    monkeypatch.setattr(native, "available", lambda: False)
    L2, U2 = linalg.ilu0(a)
    np.testing.assert_array_equal(np.asarray(L1.data), np.asarray(L2.data))
    np.testing.assert_array_equal(np.asarray(U1.data), np.asarray(U2.data))


def test_ilu0_missing_diagonal_raises():
    dense = np.zeros((3, 3), np.float32)
    dense[0, 0] = dense[2, 2] = 1.0
    dense[1, 0] = 1.0  # row 1 has no diagonal entry
    a = CSR.from_dense(jnp.asarray(dense))
    with pytest.raises(ValueError, match="row 1"):
        linalg.ilu0(a)


def test_ic0_matches_dense_cholesky_on_full_pattern(rng):
    # on a DENSE SPD matrix IC(0) == exact Cholesky
    n = 12
    m = rng.random((n, n), dtype=np.float32) - 0.5
    spd = m @ m.T + n * np.eye(n, dtype=np.float32)
    L = linalg.ic0(CSR.from_dense(jnp.asarray(spd)))
    ref = np.linalg.cholesky(spd.astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(L.to_dense(), np.float64), ref, rtol=1e-5, atol=1e-5
    )


def test_ic0_llt_matches_on_pattern():
    a = _spd(15, n=64, density=0.06)
    L = linalg.ic0(a)
    ld = np.asarray(L.to_dense(), np.float64)
    llt = ld @ ld.T
    ad = np.asarray(a.to_dense(), np.float64)
    mask = np.asarray(a.to_scipy().astype(bool).todense()) & (
        np.abs(np.tril(ad)) > 0
    )
    np.testing.assert_allclose(llt[mask], ad[mask], rtol=1e-5, atol=1e-6)


def test_ic0_rejects_indefinite():
    dense = np.array([[1.0, 2.0], [2.0, 1.0]], np.float32)  # indefinite
    with pytest.raises(ValueError, match="positive"):
        linalg.ic0(CSR.from_dense(jnp.asarray(dense)))


def _iters_to_converge(errs):
    return len(errs)


def test_ilu_preconditioner_accelerates_gmres(rng):
    a = _with_diagonal(16, 96, 0.08)
    b = jnp.asarray(rng.random((96,), dtype=np.float32))
    M = linalg.ilu_preconditioner(a)
    x, _ = linalg.gmres(a, b, M=M, tol=1e-6, maxiter=200)
    ref = sla.spsolve(_to_scipy64(a).tocsc(), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x, np.float64), ref, rtol=2e-4, atol=2e-5)


def test_ic_preconditioner_accelerates_cg(rng):
    a = _spd(17, n=96, density=0.05)
    b = jnp.asarray(rng.random((96,), dtype=np.float32))
    M = linalg.ic_preconditioner(a)
    x, _ = linalg.cg(a, b, M=M, tol=1e-6, maxiter=300)
    ref = sla.spsolve(_to_scipy64(a).tocsc(), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x, np.float64), ref, rtol=2e-4, atol=2e-5)


def test_preconditioned_cg_under_jit(rng):
    a = _spd(18, n=48, density=0.08)
    M = linalg.ic_preconditioner(a)
    b = jnp.asarray(rng.random((48,), dtype=np.float32))

    @jax.jit
    def solve(bv):
        x, _ = linalg.cg(a, bv, M=M, tol=1e-6, maxiter=200)
        return x

    ref = sla.spsolve(_to_scipy64(a).tocsc(), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(solve(b), np.float64), ref, rtol=2e-4, atol=2e-5)


def test_rcm_reduces_bandwidth():
    # a banded matrix hidden by a random symmetric permutation: RCM must
    # recover (nearly) the banded ordering
    rng = np.random.default_rng(5)
    n = 128
    dense = np.zeros((n, n), np.float32)
    for off in range(-3, 4):
        idx = np.arange(max(0, -off), min(n, n - off))
        dense[idx, idx + off] = rng.random(idx.size) + 0.1
    hide = rng.permutation(n)
    from tpusparse import permute_csr

    a = permute_csr(CSR.from_dense(jnp.asarray(dense)), hide, hide)
    assert linalg.bandwidth(a) > 20
    perm = linalg.rcm_permutation(a)
    a_rcm = permute_csr(a, perm, perm)
    assert linalg.bandwidth(a_rcm) <= 8
    # permutation preserves the spectrum-driven solves: solve then unpermute
    b = rng.random(n).astype(np.float32)
    spd = sp_add(a, transpose_csr(a), 1.0, 1.0)
    spd = sp_add(spd, linalg.speye(n), 1.0, 10.0)
    spd_rcm = permute_csr(spd, perm, perm)
    x_rcm, _ = linalg.cg(spd_rcm, jnp.asarray(b[perm]), tol=1e-6, maxiter=400)
    x = np.empty(n, np.float64)
    x[perm] = np.asarray(x_rcm, np.float64)
    ref = sla.spsolve(_to_scipy64(spd).tocsc(), b.astype(np.float64))
    np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-5)


def test_bandwidth_trivia():
    assert linalg.bandwidth(linalg.speye(5)) == 0


# ---- Lanczos eigsh ----


def test_eigsh_lanczos_matches_scipy():
    a = _spd(11, n=160, density=0.05)
    a64 = _to_scipy64(a)
    for which, k in (("LA", 4), ("SA", 3), ("LM", 2)):
        vals, vecs = linalg.eigsh_lanczos(a, k=k, which=which, iters=70)
        dense_vals = np.linalg.eigvalsh(a64.toarray())
        if which == "LA":
            ref = dense_vals[::-1][:k]
        elif which == "SA":
            ref = dense_vals[:k]
        else:
            ref = dense_vals[np.argsort(np.abs(dense_vals))[::-1][:k]]
        np.testing.assert_allclose(
            np.sort(np.asarray(vals)), np.sort(ref), rtol=1e-3, atol=1e-3
        )
        # eigen residuals against the fp64 operator
        for i in range(k):
            v = np.asarray(vecs[:, i], np.float64)
            lam = float(np.asarray(vals)[i])
            assert np.linalg.norm(a64 @ v - lam * v) < 2e-2, (which, i)


def test_eigsh_lanczos_under_jit():
    a = _spd(12, n=96)
    f = jax.jit(lambda: linalg.eigsh_lanczos(a, k=2, iters=40))
    vals_j, _ = f()
    vals_e, _ = linalg.eigsh_lanczos(a, k=2, iters=40)
    np.testing.assert_allclose(
        np.asarray(vals_j), np.asarray(vals_e), rtol=1e-4, atol=1e-5
    )


def test_eigsh_lanczos_agrees_with_lobpcg_and_power():
    a = _spd(13, n=128)
    vals, _ = linalg.eigsh_lanczos(a, k=1, iters=60)
    lam_p, _ = linalg.power_iteration(a, iters=300)
    np.testing.assert_allclose(float(vals[0]), float(lam_p), rtol=1e-3)


def test_eigsh_lanczos_guards():
    with pytest.raises(ValueError, match="square"):
        linalg.eigsh_lanczos(random_csr(0, (8, 9), 0.5))
    a = _spd(14, n=32)
    with pytest.raises(ValueError, match="which"):
        linalg.eigsh_lanczos(a, which="XX")
    with pytest.raises(ValueError, match="at least"):
        linalg.eigsh_lanczos(a, k=30, iters=8)


# ---- expm_multiply / block-Jacobi ----


def test_expm_multiply_matches_scipy(rng):
    import scipy.sparse.linalg as sla2

    a = _spd(21, n=200, density=0.04)
    a64 = _to_scipy64(a)
    v = rng.normal(size=(200,)).astype(np.float32)
    for t in (0.2, -0.7):
        got = np.asarray(linalg.expm_multiply(a, jnp.asarray(v), t, krylov_dim=40))
        ref = sla2.expm_multiply(t * a64, v.astype(np.float64))
        np.testing.assert_allclose(
            got, ref, rtol=1e-3, atol=1e-4 * np.abs(ref).max()
        )
    # t=0 is the identity
    got0 = np.asarray(linalg.expm_multiply(a, jnp.asarray(v), 0.0))
    np.testing.assert_allclose(got0, v, rtol=1e-4, atol=1e-5)
    # jit parity
    gj = jax.jit(lambda vv: linalg.expm_multiply(a, vv, 0.2, krylov_dim=40))(
        jnp.asarray(v)
    )
    ge = linalg.expm_multiply(a, jnp.asarray(v), 0.2, krylov_dim=40)
    np.testing.assert_allclose(np.asarray(gj), np.asarray(ge), rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError, match="square"):
        linalg.expm_multiply(random_csr(0, (8, 9), 0.5), jnp.zeros((9,)))


def test_block_jacobi_is_exact_blockwise_inverse(rng):
    # block-diagonal A: the preconditioner IS the inverse
    import scipy.linalg as sl

    blocks = [
        rng.normal(size=(16, 16)).astype(np.float64) for _ in range(4)
    ]
    blocks = [b @ b.T + 16 * np.eye(16) for b in blocks]
    import scipy.sparse as ssp2

    a_sp = ssp2.block_diag(blocks, format="csr").astype(np.float32)
    a_sp.sort_indices()
    a = CSR.from_scipy(a_sp)
    m = linalg.block_jacobi_preconditioner(a, block_size=16)
    v = rng.normal(size=(64,)).astype(np.float32)
    ref = np.linalg.solve(sl.block_diag(*blocks), v.astype(np.float64))
    np.testing.assert_allclose(np.asarray(m(jnp.asarray(v))), ref, rtol=1e-3, atol=1e-4)
    # multivector + ragged final block (n not divisible by block_size)
    vk = rng.normal(size=(64, 3)).astype(np.float32)
    out = np.asarray(m(jnp.asarray(vk)))
    for k in range(3):
        np.testing.assert_allclose(
            out[:, k], np.asarray(m(jnp.asarray(vk[:, k]))), rtol=1e-5
        )
    a27 = _spd(22, n=27)
    m27 = linalg.block_jacobi_preconditioner(a27, block_size=8)
    v27 = jnp.asarray(rng.normal(size=(27,)).astype(np.float32))
    assert np.isfinite(np.asarray(m27(v27))).all()


def test_block_jacobi_preconditioned_cg(rng):
    a = _spd(23, n=160, density=0.06)
    b = jnp.asarray(rng.normal(size=(160,)).astype(np.float32))
    M = linalg.block_jacobi_preconditioner(a, block_size=20)
    x, _ = linalg.cg(a, b, M=M, tol=1e-8, maxiter=200)
    a64 = _to_scipy64(a)
    r = a64 @ np.asarray(x, np.float64) - np.asarray(b, np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-4


def test_eigsh_lanczos_breakdown_returns_true_extremes():
    # 2*I exhausts the Krylov space after one step; the decoupled zero
    # block must not produce spurious 0 eigenvalues or NaN vectors
    a = sp_add(linalg.speye(32), linalg.speye(32))
    for which, sign in (("LA", 1.0), ("SA", 1.0), ("LM", 1.0)):
        vals, vecs = linalg.eigsh_lanczos(a, k=2, which=which, iters=10)
        assert float(np.asarray(vals)[0]) == pytest.approx(2.0, rel=1e-5)
        # surplus slots (k beyond the Krylov dimension) are NaN, not 0
        assert np.isnan(np.asarray(vals)[1])
        assert np.isfinite(np.asarray(vecs)[:, 0]).all()


def test_svds_matches_scipy():
    m, n, k = 120, 80, 5
    A = ssp.random(m, n, density=0.08, random_state=3, format="csr", dtype=np.float64)
    A.data += 1.0
    a = CSR.from_scipy(A.astype(np.float32).tocsr())
    u, s, vt = linalg.svds(a, k=k, iters=40)
    s_ref = np.sort(sla.svds(A, k=k, return_singular_vectors=False))[::-1]
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-4)
    # triplets reconstruct the best rank-k approximation
    dense = A.toarray()
    ur, sr, vtr = np.linalg.svd(dense)
    best = ur[:, :k] @ np.diag(sr[:k]) @ vtr[:k, :]
    recon = np.asarray(u, np.float64) @ np.diag(np.asarray(s, np.float64)) @ np.asarray(vt, np.float64)
    assert np.linalg.norm(recon - best) / np.linalg.norm(best) < 1e-4
    # bases are orthonormal
    np.testing.assert_allclose(np.asarray(u).T @ np.asarray(u), np.eye(k), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vt) @ np.asarray(vt).T, np.eye(k), atol=1e-4)


def test_svds_tall_and_wide_orientations():
    for shape in ((90, 40), (40, 90)):
        A = ssp.random(*shape, density=0.1, random_state=9, format="csr", dtype=np.float64)
        A.data += 0.5
        a = CSR.from_scipy(A.astype(np.float32).tocsr())
        _, s, _ = linalg.svds(a, k=3, iters=36)
        s_ref = np.sort(sla.svds(A, k=3, return_singular_vectors=False))[::-1]
        np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-4)


def test_svds_rank_deficient_surplus_is_nan():
    # rank-2 matrix: asking for 4 triplets must flag the surplus as NaN
    d = np.zeros((30, 20), np.float32)
    d[2, 3] = 5.0
    d[7, 11] = 3.0
    a = CSR.from_dense(jnp.asarray(d))
    _, s, _ = linalg.svds(a, k=4, iters=16)
    s = np.asarray(s)
    np.testing.assert_allclose(s[:2], [5.0, 3.0], rtol=1e-5)
    assert np.isnan(s[2:]).all()


def test_svds_guards():
    a = random_csr(0, (16, 12), 0.3)
    with pytest.raises(ValueError, match="k="):
        linalg.svds(a, k=10, iters=4)


def test_lsqr_overdetermined_matches_lstsq(rng):
    m, n = 150, 60
    B = ssp.random(m, n, density=0.1, random_state=5, format="csr", dtype=np.float64)
    B = (B + ssp.eye(m, n) * 2.0).tocsr()
    b = rng.normal(size=(m,)).astype(np.float64)
    x_ref = np.linalg.lstsq(B.toarray(), b, rcond=None)[0]
    x = linalg.lsqr(
        CSR.from_scipy(B.astype(np.float32).tocsr()),
        jnp.asarray(b, jnp.float32),
        iters=80,
    )
    np.testing.assert_allclose(np.asarray(x, np.float64), x_ref, rtol=1e-3, atol=1e-4)


def test_lsqr_damped_matches_tikhonov(rng):
    m, n, damp = 100, 40, 0.5
    B = ssp.random(m, n, density=0.12, random_state=6, format="csr", dtype=np.float64)
    B = (B + ssp.eye(m, n)).tocsr()
    b = rng.normal(size=(m,)).astype(np.float64)
    d = B.toarray()
    x_ref = np.linalg.solve(d.T @ d + damp**2 * np.eye(n), d.T @ b)
    x = linalg.lsqr(
        CSR.from_scipy(B.astype(np.float32).tocsr()),
        jnp.asarray(b, jnp.float32),
        damp=damp,
        iters=80,
    )
    np.testing.assert_allclose(np.asarray(x, np.float64), x_ref, rtol=1e-3, atol=1e-4)


def test_lsqr_square_consistent_and_jit(rng):
    a = _spd(31, n=64)
    x_true = rng.normal(size=(64,)).astype(np.float32)
    b = jnp.asarray(_to_scipy64(a) @ x_true.astype(np.float64), jnp.float32)
    x = jax.jit(lambda bb: linalg.lsqr(a, bb, iters=120))(b)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-2, atol=1e-3)
    with pytest.raises(ValueError, match="b must be"):
        linalg.lsqr(a, jnp.zeros((3,)))


def test_minres_symmetric_indefinite(rng):
    n = 100
    C = ssp.random(n, n, density=0.05, random_state=7, format="csr", dtype=np.float64)
    S = ((C + C.T) * 0.5 + ssp.diags(
        np.concatenate([np.full(n // 2, 3.0), np.full(n - n // 2, -3.0)])
    )).tocsr()
    b = rng.normal(size=(n,)).astype(np.float64)
    x_ref = np.linalg.solve(S.toarray(), b)
    x = linalg.minres(
        CSR.from_scipy(S.astype(np.float32).tocsr()),
        jnp.asarray(b, jnp.float32),
        iters=200,
    )
    np.testing.assert_allclose(np.asarray(x, np.float64), x_ref, rtol=1e-3, atol=1e-4)


def test_minres_preconditioned_under_jit(rng):
    # indefinite diagonal: Jacobi is NOT SPD — use |diag|^-1, which is
    n = 100
    C = ssp.random(n, n, density=0.05, random_state=7, format="csr", dtype=np.float64)
    S = ((C + C.T) * 0.5 + ssp.diags(
        np.concatenate([np.full(n // 2, 3.0), np.full(n - n // 2, -3.0)])
    )).tocsr()
    b = rng.normal(size=(n,)).astype(np.float64)
    x_ref = np.linalg.solve(S.toarray(), b)
    a = CSR.from_scipy(S.astype(np.float32).tocsr())
    dinv = jnp.asarray(1.0 / np.abs(S.diagonal()), jnp.float32)
    x = jax.jit(
        lambda bb: linalg.minres(a, bb, M=lambda v: v * dinv, iters=200)
    )(jnp.asarray(b, jnp.float32))
    np.testing.assert_allclose(np.asarray(x, np.float64), x_ref, rtol=1e-3, atol=1e-4)
    with pytest.raises(ValueError, match="square"):
        linalg.minres(random_csr(0, (8, 9), 0.5), jnp.zeros((9,)))


def test_minres_matches_cg_on_spd(rng):
    # on an SPD system both Krylov methods find the same solution
    a = _spd(41, n=96)
    b = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    x_mr = linalg.minres(a, b, iters=150)
    x_cg, _ = linalg.cg(a, b, tol=1e-9, maxiter=300)
    np.testing.assert_allclose(
        np.asarray(x_mr), np.asarray(x_cg), rtol=1e-3, atol=1e-4
    )
