"""Smoothed-aggregation AMG preconditioner.

No reference analog (the reference stops at the matmul layer) — AMG is
the capstone consumer of the framework's own primitives: the hierarchy
is built with spgemm (Galerkin Pᵀ·A·P) + sp_sub/sp_scale, and the
V-cycle is plan-cached spmm matvecs, so these tests exercise SpGEMM and
SpMM composing under jit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as ssp

import tpusparse as ts
from tpusparse.amg import smoothed_aggregation_setup
from tpusparse.linalg import cg


def _poisson2d(n1, dtype=np.float32):
    """I⊗T + T⊗I built with the framework's own sp_kron."""
    T = ssp.diags([-1, 2, -1], [-1, 0, 1], shape=(n1, n1), format="csr")
    I = ssp.eye(n1, format="csr")

    def s(m):
        m = m.tocsr().astype(dtype)
        m.sort_indices()
        return ts.CSR.from_scipy(m)

    return ts.sp_add(ts.sp_kron(s(I), s(T)), ts.sp_kron(s(T), s(I)))


def _resid(a, x, b):
    r = np.asarray(b) - np.asarray(ts.spmm(a, x[:, None]))[:, 0]
    return np.linalg.norm(r) / np.linalg.norm(np.asarray(b))


@pytest.fixture(scope="module")
def poisson():
    a = _poisson2d(24)
    m = smoothed_aggregation_setup(a, coarse_size=40)
    return a, m


def test_hierarchy_shape(poisson):
    a, m = poisson
    assert len(m.levels) >= 2
    # strictly coarsening, last level small enough for the dense solve
    sizes = [l.a.shape[0] for l in m.levels]
    assert sizes == sorted(sizes, reverse=True) and sizes[-1] <= 40
    assert m.grid_complexity < 2.0
    assert "level 0" in m.report()


def test_galerkin_product_matches_dense(poisson):
    a, m = poisson
    lvl = m.levels[0]
    p = np.asarray(lvl.p.to_dense(), np.float64)
    a0 = np.asarray(a.to_dense(), np.float64)
    ac = np.asarray(m.levels[1].a.to_dense(), np.float64)
    np.testing.assert_allclose(ac, p.T @ a0 @ p, rtol=1e-4, atol=1e-5)


def test_vcycle_contracts(poisson):
    a, m = poisson
    rng = np.random.default_rng(0)
    n = a.shape[0]
    b = ts.spmm(a, jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32)))[
        :, 0
    ]
    x = jnp.zeros_like(b)
    resids = []
    for _ in range(6):
        x = x + m(b - ts.spmm(a, x[:, None])[:, 0])
        resids.append(_resid(a, x, b))
    # standalone stationary solver: robust contraction every cycle
    assert resids[-1] < 1e-3, resids
    for r0, r1 in zip(resids, resids[1:]):
        assert r1 < 0.6 * r0, resids


def test_preconditioned_cg_beats_plain(poisson):
    a, m = poisson
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=(a.shape[0],)).astype(np.float32))
    x_amg, _ = cg(a, b, M=m, tol=0.0, maxiter=10)
    x_plain, _ = cg(a, b, tol=0.0, maxiter=10)
    assert _resid(a, x_amg, b) < 1e-2 * _resid(a, x_plain, b)


def test_apply_under_jit_and_multivector(poisson):
    a, m = poisson
    rng = np.random.default_rng(2)
    n = a.shape[0]
    b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(jax.jit(m)(b)), np.asarray(m(b)), rtol=1e-5, atol=1e-5
    )
    v = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    out = np.asarray(m(v))
    for k in range(3):
        np.testing.assert_allclose(
            out[:, k], np.asarray(m(v[:, k])), rtol=1e-4, atol=1e-5
        )


def test_guards():
    with pytest.raises(ValueError, match="square"):
        smoothed_aggregation_setup(ts.random_csr(0, (8, 9), 0.5))
    # zero diagonal rejected
    a = ssp.csr_matrix(
        np.array([[0.0, 1.0], [1.0, 2.0]], np.float32)
    )
    a.sort_indices()
    with pytest.raises(ValueError, match="diagonal"):
        smoothed_aggregation_setup(ts.CSR.from_scipy(a))


def test_tiny_matrix_direct():
    # n below coarse_size: hierarchy is a single dense-LU level
    a = _poisson2d(3)
    m = smoothed_aggregation_setup(a, coarse_size=40)
    assert len(m.levels) == 1
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.normal(size=(9,)).astype(np.float32))
    x = m(b)
    np.testing.assert_allclose(
        np.asarray(ts.spmm(a, x[:, None]))[:, 0], np.asarray(b),
        rtol=1e-4, atol=1e-5,
    )


def test_chebyshev_smoother_beats_jacobi_at_matched_cost():
    a = _poisson2d(16)
    n = a.shape[0]
    ad = np.asarray(a.to_dense(), np.float64)
    eye = np.eye(n, dtype=np.float32)

    def radius(m):
        out = np.asarray(m(jnp.asarray(ad.astype(np.float32) @ eye)))
        return np.abs(np.linalg.eigvals(np.eye(n) - out)).max()

    r_jac = radius(smoothed_aggregation_setup(a, coarse_size=30))
    r_cheb = radius(
        smoothed_aggregation_setup(a, coarse_size=30, smoother="chebyshev")
    )
    # same 4 spmm/cycle; chebyshev's uniform-interval damping wins
    assert r_cheb < r_jac < 1.0, (r_cheb, r_jac)
    with pytest.raises(ValueError, match="smoother"):
        smoothed_aggregation_setup(a, smoother="sor")


def test_chebyshev_preconditioned_cg_converges():
    a = _poisson2d(20)
    m = smoothed_aggregation_setup(a, coarse_size=40, smoother="chebyshev")
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.normal(size=(a.shape[0],)).astype(np.float32))
    x, _ = cg(a, b, M=m, tol=1e-7, maxiter=30)
    assert _resid(a, x, b) < 1e-5


def test_factored_prolongator_matches_assembled(poisson):
    a, m = poisson
    lvl = m.levels[0]
    assert lvl.p_fact is not None  # Poisson levels are banded -> DIA
    rng = np.random.default_rng(5)
    nc = m.levels[1].a.shape[0]
    e = jnp.asarray(rng.normal(size=(nc,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(lvl.p_fact.mv(e)),
        np.asarray(ts.spmm(lvl.p, e[:, None]))[:, 0],
        rtol=1e-4, atol=1e-5,
    )
    r = jnp.asarray(rng.normal(size=(a.shape[0],)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(lvl.p_fact.rmv(r)),
        np.asarray(ts.spmm(lvl.r, r[:, None]))[:, 0],
        rtol=1e-4, atol=1e-5,
    )


# ---------------------------------------------------------------------------
# r3: per-level format routing (DIA / hybrid DIA+CSR) + theta decay
# ---------------------------------------------------------------------------


def _laplace3d_csr(n1):
    T = ssp.diags([-1, 2, -1], [-1, 0, 1], shape=(n1, n1), format="csr")
    I = ssp.eye(n1, format="csr")
    a = (
        ssp.kron(ssp.kron(T, I), I)
        + ssp.kron(ssp.kron(I, T), I)
        + ssp.kron(ssp.kron(I, I), T)
    ).tocsr().astype(np.float32)
    a.sort_indices()
    return ts.CSR.from_scipy(a)


def test_route_level_split_reconstructs():
    """_route_level's DIA + remainder parts must reassemble EXACTLY to
    the input operator (same entries, no duplicates, no loss)."""
    from tpusparse.amg import _route_level

    rng = np.random.default_rng(0)
    n = 64
    # banded core + scattered tail: both routes exercised
    a = ssp.diags(
        [rng.random(n - 1), 2 + rng.random(n), rng.random(n - 1)],
        [-1, 0, 1], format="lil",
    )
    for _ in range(40):
        i, j = rng.integers(0, n, 2)
        a[i, j] = rng.random() + 0.1
    a = a.tocsr().astype(np.float64)
    a.sort_indices()
    split = _route_level(a.indptr, a.indices, a.data, n, np.float32)
    assert split is not None
    dia_host, offs, rem = split
    dense = np.zeros((n, n), np.float64)
    for s_, off in enumerate(offs):
        for r in range(n):
            c = r + off
            if 0 <= c < n:
                dense[r, c] += dia_host[s_, r]
    if rem is not None:
        rip, rix, rd = rem
        rrows = np.repeat(np.arange(n), np.diff(rip))
        dense[rrows, rix] += rd
    np.testing.assert_allclose(dense, a.toarray(), rtol=1e-6, atol=1e-7)


def test_laplace3d_hierarchy_coarsens_and_converges():
    """The theta decay must keep 3-D coarsening aggressive (the fixed-θ
    hierarchy stalled at ratio 1.09 with a 44%-dense level), and the
    hybrid-routed V-cycle must still precondition CG."""
    a = _laplace3d_csr(12)  # n=1728
    m = smoothed_aggregation_setup(a, coarse_size=60)
    ns = [lvl.a.shape[0] for lvl in m.levels]
    for fine, coarse in zip(ns, ns[1:]):
        assert coarse <= fine / 2.5, ns  # no stall
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=a.shape[0]).astype(np.float32))
    x, _ = cg(a, b, M=m, tol=1e-6, maxiter=40)
    assert _resid(a, x, b) < 1e-4


def test_hybrid_level_matvec_matches_scipy():
    """A deterministically-hybrid operator (dense band + scattered tail
    too thin to stream): _route_level must split it, and _HybridOp.mv
    under jit must equal the scipy matvec."""
    from tpusparse.amg import _HybridOp, _route_level

    rng = np.random.default_rng(2)
    n = 4096
    a = ssp.diags(
        [rng.random(n - 1), 2 + rng.random(n), rng.random(n - 1)],
        [-1, 0, 1], format="lil",
    )
    for _ in range(300):  # ~hundreds of 1-entry diagonals
        i, j = rng.integers(0, n, 2)
        a[i, j] = rng.random() + 0.1
    a = a.tocsr().astype(np.float32)
    a.sort_indices()
    split = _route_level(a.indptr, a.indices, a.data.astype(np.float64),
                         n, np.float32)
    assert split is not None
    dia_host, offs, rem = split
    assert rem is not None, "scattered tail should be routed to CSR"
    from tpusparse.types import DIA

    rip, rix, rd = rem
    op = _HybridOp(
        dia=DIA(data=jnp.asarray(dia_host), offsets=offs, shape=(n, n)),
        rem=ts.CSR(data=jnp.asarray(rd.astype(np.float32)),
                   indices=rix, indptr=rip, shape=(n, n)),
        shape=(n, n),
    )
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    got = np.asarray(jax.jit(op.mv)(x))
    ref = a.astype(np.float64) @ np.asarray(x, np.float64)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_theta_decay_disable_matches_legacy(poisson):
    """theta_decay=1.0 reproduces the fixed-θ behavior on 2-D Poisson
    (where fixed θ was fine) — the knob is additive, not a change to
    the 2-D hierarchy quality."""
    a, _ = poisson
    m_fixed = smoothed_aggregation_setup(a, coarse_size=40, theta_decay=1.0)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=a.shape[0]).astype(np.float32))
    x, _ = cg(a, b, M=m_fixed, tol=1e-6, maxiter=40)
    assert _resid(a, x, b) < 1e-4


def test_routed_csr_level_threads_as_jit_argument(monkeypatch):
    """A hierarchy that provably contains CSR-routed levels (_RoutedCSR)
    must flatten as a pytree and solve with the preconditioner passed as
    a JIT ARGUMENT — the literal-free form realmatrix_benchmark times
    (r4 advisor repro: unregistered _RoutedCSR raised 'not a valid JAX
    type' here), and the CSR levels' P/R must ride their setup-resolved
    executors (p_op/r_op), not the in-trace gather floor. _route_level
    is pinned to all-CSR so the scenario survives cost-constant refits
    (the r5 DIA-kernel refit made the old unstructured fixture route
    every level to DIA — correctly)."""
    import tpusparse.amg as amg_mod
    from tpusparse.amg import _RoutedCSR, smoothed_aggregation_setup

    monkeypatch.setattr(amg_mod, "_route_level", lambda *a, **k: None)
    rng = np.random.default_rng(3)
    n = 1500
    g = ssp.random(n, n, density=0.004, random_state=7, format="csr")
    spd = (g @ g.T).tocsr()
    spd = (spd + ssp.identity(n) * (np.abs(spd).sum(axis=1).max() + 1.0)).tocsr()
    spd.sort_indices()
    a = ts.CSR.from_scipy(spd.astype(np.float32))
    m = smoothed_aggregation_setup(a, coarse_size=60)
    routed = [l for l in m.levels if isinstance(l.a, _RoutedCSR)]
    assert routed, "expected at least one CSR-routed level in this hierarchy"
    # every non-coarsest CSR level must carry setup-resolved P/R executors
    for l in m.levels:
        if isinstance(l.a, _RoutedCSR) and l.p is not None and l.p_fact is None:
            assert l.p_op is not None and l.r_op is not None
    # pytree round-trip preserves the executor kinds
    leaves, treedef = jax.tree_util.tree_flatten(m)
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert [type(l.a).__name__ for l in m2.levels] == [
        type(l.a).__name__ for l in m.levels
    ]
    b = jnp.asarray(rng.normal(size=n).astype(np.float32))
    solve = jax.jit(lambda M_, r: cg(a, r, tol=1e-8, maxiter=50, M=M_)[0])
    x = np.asarray(solve(m, b))
    r = np.asarray(b) - spd.astype(np.float64) @ np.asarray(x, np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-4


def test_bf16_level_planes_converge(poisson):
    """level_dtype='bfloat16' (halved hierarchy memory; measured
    time-neutral on-chip — the wide-DIA kernel is VPU-bound) must keep
    AMG-CG convergence: the lost digits live inside M only."""
    a, _ = poisson
    m16 = smoothed_aggregation_setup(
        a, coarse_size=40, level_dtype="bfloat16"
    )
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(a.shape[0]).astype(np.float32))
    x, _ = cg(a, b, M=m16, tol=1e-8, maxiter=50)
    assert _resid(a, x, b) < 1e-4
