"""DIA (diagonal/banded) format: conversions vs scipy, the gather-free
spmm path, routing, and the solver/AMG integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as ssp
from jax.test_util import check_grads

import tpusparse as ts
from tpusparse.ops import _route_spmm, dia_spmm
from tpusparse.types import DIA, csr_to_dia, dia_to_csr


def _band(m, k, offs, seed=0):
    rng = np.random.default_rng(seed)
    mats = ssp.diags(
        [rng.normal(size=max(1, min(m + min(off, 0), k - max(off, 0))))
         for off in offs],
        offs, shape=(m, k),
    ).tocsr()
    mats.sort_indices()
    return mats.astype(np.float32)


def test_conversions_roundtrip_vs_scipy():
    m_sp = _band(32, 33, [-3, 0, 2])
    a = ts.CSR.from_scipy(m_sp)
    d = csr_to_dia(a)
    np.testing.assert_allclose(np.asarray(d.to_dense()), m_sp.toarray(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(DIA.from_scipy(m_sp.todia()).to_dense()), m_sp.toarray(), rtol=1e-6
    )
    np.testing.assert_allclose(d.to_scipy().toarray(), m_sp.toarray(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dia_to_csr(d).to_dense()), m_sp.toarray(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(DIA.from_dense(m_sp.toarray()).to_dense()),
        m_sp.toarray(), rtol=1e-6,
    )
    assert d.bandwidth == 3
    # pytree: data is the only leaf; offsets are static aux
    leaves, _ = jax.tree_util.tree_flatten(d)
    assert len(leaves) == 1


def test_dia_spmm_matches_scipy(rng):
    m_sp = _band(48, 40, [-5, -1, 0, 2, 7], seed=1)
    d = csr_to_dia(ts.CSR.from_scipy(m_sp))
    b = jnp.asarray(rng.normal(size=(40, 6)).astype(np.float32))
    ref = m_sp.astype(np.float64) @ np.asarray(b, np.float64)
    for out in (dia_spmm(d, b), ts.spmm(d, b), jax.jit(lambda bb: ts.spmm(d, bb))(b)):
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    # 1-D and batched 3-D
    v = jnp.asarray(rng.normal(size=(40,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dia_spmm(d, v)), m_sp @ np.asarray(v), rtol=1e-4, atol=1e-5
    )
    b3 = jnp.asarray(rng.normal(size=(3, 40, 5)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dia_spmm(d, b3))[1], m_sp @ np.asarray(b3[1]),
        rtol=1e-4, atol=1e-5,
    )


def test_spmm_method_dia_and_grads(rng):
    m_sp = _band(32, 32, [-1, 0, 1], seed=2)
    a = ts.CSR.from_scipy(m_sp)
    b = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    ref = m_sp.astype(np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(
        np.asarray(ts.spmm(a, b, method="dia")), ref, rtol=1e-4, atol=1e-5
    )

    # differentiable in CSR data through the dia path (jit-traced values)
    def f(data, bb):
        a2 = ts.CSR(data, a.indices, a.indptr, a.shape)
        return (ts.spmm(a2, bb, method="dia") ** 2).sum()

    check_grads(f, (a.data, b), order=1, modes=("rev",),
                atol=2e-2, rtol=2e-2, eps=1e-3)


def test_errors():
    # big enough that the pattern spreads over >128 distinct diagonals
    # (a 64x64 matrix has at most 127 — it is ALWAYS "banded")
    r = ts.random_csr(0, (512, 512), 0.02)
    with pytest.raises(ValueError, match="banded"):
        ts.spmm(r, jnp.zeros((512, 2)), method="dia")
    d = csr_to_dia(ts.CSR.from_scipy(_band(16, 16, [0])))
    with pytest.raises(ValueError, match="incompatible"):
        ts.spmm(d, jnp.zeros((9, 2)))
    with pytest.raises(ValueError, match="sum"):
        ts.spmm(d, jnp.zeros((16, 2)), reduce="max")
    with pytest.raises(ValueError, match="sorted"):
        DIA(jnp.zeros((2, 4)), np.array([1, 1]), (4, 4))


def test_router_prefers_dia_on_banded_spmv():
    n1 = 64
    T = ssp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n1, n1), format="csr")
    I = ssp.eye(n1, format="csr")
    p2 = (ssp.kron(I, T) + ssp.kron(T, I)).tocsr().astype(np.float32)
    p2.sort_indices()
    a = ts.CSR.from_scipy(p2)
    assert _route_spmm(a, jnp.zeros((n1 * n1, 1)), None) == "dia"
    # unbanded pattern must not route dia
    r = ts.random_csr(1, (512, 512), 0.02)
    assert _route_spmm(r, jnp.zeros((512, 1)), None) != "dia"


def test_as_matvec_upgrades_banded_and_cg_converges(rng):
    from tpusparse.linalg import _maybe_dia, cg

    n1 = 16
    T = ssp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n1, n1), format="csr")
    I = ssp.eye(n1, format="csr")
    p2 = (ssp.kron(I, T) + ssp.kron(T, I) + 0.1 * ssp.eye(n1 * n1)).tocsr()
    p2 = p2.astype(np.float32)
    p2.sort_indices()
    a = ts.CSR.from_scipy(p2)
    up = _maybe_dia(a)
    assert isinstance(up, DIA)
    b = jnp.asarray(rng.normal(size=(n1 * n1,)).astype(np.float32))
    # CSR operand (auto-upgraded inside) and explicit DIA operand agree
    x1, _ = cg(a, b, tol=1e-7, maxiter=500)
    x2, _ = cg(up, b, tol=1e-7, maxiter=500)
    ref = np.linalg.solve(p2.toarray().astype(np.float64), np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(x1), ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x2), ref, rtol=1e-3, atol=1e-4)
    # unbanded stays CSR
    assert isinstance(_maybe_dia(ts.random_csr(2, (512, 512), 0.02)), ts.CSR)


def test_amg_levels_use_dia_and_match_previous_numerics():
    n1 = 24
    T = ssp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n1, n1), format="csr")
    I = ssp.eye(n1, format="csr")
    s = lambda m: ts.CSR.from_scipy(m.tocsr().astype(np.float32))
    a = ts.sp_add(ts.sp_kron(s(I), s(T)), ts.sp_kron(s(T), s(I)))
    m = ts.smoothed_aggregation_setup(a, coarse_size=40)
    assert isinstance(m.levels[0].a, DIA)
    assert "[dia:" in m.report()  # r3: per-level diagonal counts
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(n1 * n1,)).astype(np.float32))
    out = m(b)
    assert np.isfinite(np.asarray(out)).all()
    # V-cycle still contracts
    x = jnp.zeros_like(b)
    for _ in range(6):
        x = x + m(b - ts.spmm(a, x[:, None])[:, 0])
    r = np.asarray(b) - np.asarray(ts.spmm(a, x[:, None]))[:, 0]
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-3


def test_dia_transpose(rng):
    for (m, k, offs) in [(32, 33, [-3, 0, 2]), (20, 15, [-6, -1, 0, 4]),
                         (5, 9, [-2, 3, 8])]:
        diags = [
            rng.normal(size=max(1, min(m + min(o, 0), k - max(o, 0))))
            for o in offs
        ]
        msp = ssp.diags(diags, offs, shape=(m, k)).tocsr()
        msp.sort_indices()
        d = csr_to_dia(ts.CSR.from_scipy(msp.astype(np.float32)))
        np.testing.assert_allclose(
            np.asarray(d.T.to_dense()), msp.toarray().T, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(d.T.T.to_dense()), msp.toarray(), rtol=1e-5, atol=1e-6
        )


def test_tridiagonal_solve(rng):
    from tpusparse.linalg import tridiagonal_solve

    n = 150
    t_sp = ssp.diags(
        [rng.normal(size=n - 1), 4.0 + rng.normal(size=n), rng.normal(size=n - 1)],
        [-1, 0, 1],
    ).tocsr()
    t_sp.sort_indices()
    a = ts.CSR.from_scipy(t_sp.astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    ref = np.linalg.solve(t_sp.toarray(), np.asarray(b, np.float64))
    x = tridiagonal_solve(a, b)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-3, atol=1e-4)
    # DIA operand, 1-D rhs, jit
    x1 = jax.jit(lambda bb: tridiagonal_solve(csr_to_dia(a), bb))(b[:, 0])
    np.testing.assert_allclose(np.asarray(x1), ref[:, 0], rtol=1e-3, atol=1e-4)
    with pytest.raises(ValueError):
        tridiagonal_solve(ts.random_csr(0, (512, 512), 0.02), jnp.zeros((512,)))


def test_from_scipy_with_trimmed_trailing_columns():
    # scipy trims dia data width to col.max()+1; conversion must clamp
    m_sp = ssp.coo_matrix(([1.0], ([0], [0])), shape=(5, 5)).todia()
    d = DIA.from_scipy(m_sp)
    ref = np.zeros((5, 5))
    ref[0, 0] = 1.0
    np.testing.assert_allclose(np.asarray(d.to_dense()), ref)


def test_dia_into_csr_only_api_raises_clearly():
    d = csr_to_dia(ts.CSR.from_scipy(_band(8, 8, [0])))
    with pytest.raises(TypeError, match="dia_to_csr"):
        ts.sp_add(d, d)


def test_dia_report_and_profiling_utils():
    from tpusparse.utils.profiling import kernel_report, measured_roofline

    d = csr_to_dia(ts.CSR.from_scipy(_band(64, 64, [-1, 0, 1], seed=7)))
    r = kernel_report(d, n_cols=4)
    assert r["format"] == "dia" and r["bound"] == "memory"
    assert r["noffsets"] == 3 and r["bandwidth"] == 1
    assert r["nnz"] == 3 * 64 - 2
    assert r["projected_time_s"] > 0
    mr = measured_roofline(d, time_fn=lambda: 1e-3, n_cols=4)
    assert mr["achieved_nnz_per_s"] == pytest.approx(r["nnz"] * 4 / 1e-3)


def test_dsmm_with_dia_operand(rng):
    d = csr_to_dia(ts.CSR.from_scipy(_band(40, 48, [-2, 0, 3], seed=8)))
    x = jnp.asarray(rng.normal(size=(5, 40)).astype(np.float32))
    out = ts.dsmm(x, d)
    ref = np.asarray(x, np.float64) @ d.to_scipy().toarray()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_dia_spmm_many_diagonals_scan_path(rng):
    """>128 diagonals takes the chunked-scan lowering (r3: full unrolling
    made the HLO program O(ndiag) per matvec and AMG's 1715-diagonal
    hybrid levels never finished compiling); must match the dense oracle
    and differentiate."""
    import scipy.sparse  # noqa: F401  (parity with module conventions)

    n = 700
    offs = np.unique(rng.integers(-600, 600, size=400))[:300]
    data = rng.standard_normal((offs.size, n)).astype(np.float32)
    a = DIA(data=jnp.asarray(data), offsets=offs, shape=(n, n))
    x = rng.standard_normal((n, 3)).astype(np.float32)
    y = np.asarray(jax.jit(lambda b: dia_spmm(a, b))(jnp.asarray(x)))
    dense = np.zeros((n, n))
    for s_, off in enumerate(offs):
        r = np.arange(max(0, -off), min(n, n - off))
        dense[r, r + off] += data[s_, r]
    ref = dense @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
    g = jax.grad(
        lambda d_: jnp.sum(
            dia_spmm(DIA(data=d_, offsets=offs, shape=(n, n)),
                     jnp.asarray(x)) ** 2
        )
    )(jnp.asarray(data))
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


def test_wide_dia_spmv_kernel_route_and_grads(rng):
    """>128-diagonal SpMV routes through the Pallas roll kernel
    (kernels/dia.py; 1.5x over the scan on chip, bitwise-equal) and
    stays differentiable via the scan-reference VJP."""
    n = 900
    offs = np.unique(rng.integers(-700, 700, 500))[:200]
    data = rng.standard_normal((offs.size, n)).astype(np.float32)
    a = DIA(data=jnp.asarray(data), offsets=offs, shape=(n, n))
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    y = np.asarray(dia_spmm(a, x))
    dense = np.zeros((n, n))
    for s_, off in enumerate(offs):
        r = np.arange(max(0, -off), min(n, n - off))
        dense[r, r + off] += data[s_, r]
    ref = dense @ np.asarray(x)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
    # grads w.r.t. both operands through the custom VJP
    gd, gx = jax.grad(
        lambda d_, x_: jnp.sum(
            dia_spmm(DIA(data=d_, offsets=offs, shape=(n, n)), x_) ** 2
        ),
        argnums=(0, 1),
    )(jnp.asarray(data), x)
    gx_ref = 2.0 * dense.T @ (dense @ np.asarray(x, np.float64))
    rel = np.abs(np.asarray(gx, np.float64) - gx_ref).max() / np.abs(gx_ref).max()
    assert rel < 1e-4, rel
    assert bool(jnp.isfinite(gd).all()) and float(jnp.abs(gd).max()) > 0


def test_packed_dia_operator_jit_argument(rng):
    """PackedDIA (kernels/dia.py): a wide-DIA operator whose PACKED plane
    is the pytree leaf, so an AMG hierarchy holding it can ride as a jit
    ARGUMENT — closing over a plain DIA level embeds the plane as an HLO
    literal (laplace3d_64 L1 is ~200 MB, past the tunnel's compile-payload
    limit), while threading a plain DIA re-packs per matvec in-trace."""
    from tpusparse.kernels.dia import PackedDIA, pack_dia_operator

    n = 640
    offs = np.unique(rng.integers(-400, 400, 400))[:160].astype(np.int64)
    data = rng.standard_normal((offs.size, n)).astype(np.float32)
    dense = np.zeros((n, n))
    for s_, off in enumerate(offs):
        r = np.arange(max(0, -off), min(n, n - off))
        dense[r, r + off] += data[s_, r]
    p = pack_dia_operator(jnp.asarray(data), offs, (n, n))
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    ref = dense @ np.asarray(x, np.float64)

    # eager + as a jit ARGUMENT (the design point) give the same answer
    y_eager = np.asarray(p.mv(x))
    y_arg = np.asarray(jax.jit(lambda op, v: op.mv(v))(p, x))
    assert np.abs(y_eager - ref).max() / np.abs(ref).max() < 1e-5
    np.testing.assert_array_equal(y_eager, y_arg)

    # multivector fallback (unpack in-trace) stays correct
    xm = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    ym = np.asarray(jax.jit(lambda op, v: op.mv(v))(p, xm))
    refm = dense @ np.asarray(xm, np.float64)
    assert np.abs(ym - refm).max() / np.abs(refm).max() < 1e-5

    # differentiable through the packed leaf (scan-reference VJP)
    gd3, gx = jax.grad(
        lambda d3, v: jnp.sum(
            PackedDIA(d3, p.offsets_t, p.shape, p.meta).mv(v) ** 2
        ),
        argnums=(0, 1),
    )(p.data3, x)
    gx_ref = 2.0 * dense.T @ (dense @ np.asarray(x, np.float64))
    assert np.abs(np.asarray(gx, np.float64) - gx_ref).max() / np.abs(
        gx_ref
    ).max() < 1e-4
    assert bool(jnp.isfinite(gd3).all()) and float(jnp.abs(gd3).max()) > 0


def test_amg_wide_levels_pack_and_thread_as_argument(rng):
    """A hierarchy whose wide (>128-diagonal) levels exist must (a) store
    them as PackedDIA and (b) solve correctly with the PRECONDITIONER
    PASSED AS A JIT ARGUMENT — the literal-free form the realmatrix
    benchmark times (tunnel payload limit, CLAUDE.md r2/r4 notes)."""
    import scipy.sparse as _ssp

    from tpusparse.amg import _HybridOp, amg_preconditioner
    from tpusparse.kernels.dia import PackedDIA
    from tpusparse.linalg import cg

    n1 = 24
    T = _ssp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (n1, n1), format="csr")
    I = _ssp.identity(n1, format="csr")
    A3 = (
        _ssp.kron(_ssp.kron(T, I), I)
        + _ssp.kron(_ssp.kron(I, T), I)
        + _ssp.kron(_ssp.kron(I, I), T)
    ).tocsr()
    a = ts.CSR(
        data=jnp.asarray(A3.data.astype(np.float32)),
        indices=jnp.asarray(A3.indices.astype(np.int32)),
        indptr=jnp.asarray(A3.indptr.astype(np.int32)),
        shape=A3.shape,
    )
    M = amg_preconditioner(a)
    packed = [
        lvl.a.dia if isinstance(lvl.a, _HybridOp) else lvl.a
        for lvl in M.levels
        if isinstance(lvl.a, PackedDIA)
        or (isinstance(lvl.a, _HybridOp)
            and isinstance(lvl.a.dia, PackedDIA))
    ]
    # 3-D Galerkin coarse operators spread wide: the hierarchy should
    # have at least one packed level (if coarsening keeps them all ≤128
    # diagonals at this size, the test still validates argument passing)
    rhs = jnp.asarray(rng.normal(size=A3.shape[0]).astype(np.float32))
    solve = jax.jit(lambda M_, r: cg(a, r, tol=1e-8, maxiter=60, M=M_)[0])
    x = np.asarray(solve(M, rhs))
    resid = np.linalg.norm(A3 @ x - np.asarray(rhs)) / np.linalg.norm(
        np.asarray(rhs)
    )
    assert resid < 1e-4, (resid, len(packed))
