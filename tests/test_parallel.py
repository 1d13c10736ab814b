"""Multi-device tests on the 8-virtual-CPU-device mesh.

The reference has no distributed components (SURVEY.md §2.5); these tests
validate the new sharded SpMM paths (row-partitioned + ring halo) against
the single-device reference op, and the dp×tp training step end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse import random_csr, spmm_reference
from tpusparse.parallel import (
    halo_spmm,
    make_mesh,
    shard_plan_2d,
    shard_plan_rows,
    sharded_spmm,
)
from tpusparse.parallel.train import (
    ShardedMLPConfig,
    make_sharded_train_state,
    make_sharded_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh((1, 8), ("data", "model"))


@pytest.fixture(scope="module")
def mesh2x4():
    return make_mesh((2, 4), ("data", "model"))


@pytest.mark.parametrize("shape", [(128, 96), (200, 130)])
def test_sharded_spmm_matches_reference(rng, mesh8, shape):
    a = random_csr(0, shape, 0.08)
    b = jnp.asarray(rng.random((shape[1], 24), dtype=np.float32))
    rsp = shard_plan_rows(a, 8, blocksize=(8, 16))
    out = sharded_spmm(rsp, a.data, b, mesh8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("shape", [(128, 128), (160, 250)])
def test_halo_spmm_matches_reference(rng, mesh8, shape):
    a = random_csr(1, shape, 0.06)
    b = jnp.asarray(rng.random((shape[1], 16), dtype=np.float32))
    hsp = shard_plan_2d(a, 8, blocksize=(8, 16))
    out = halo_spmm(hsp, a.data, b, mesh8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-5
    )


def test_halo_spmm_on_2d_mesh(rng, mesh2x4):
    a = random_csr(2, (64, 64), 0.1)
    b = jnp.asarray(rng.random((64, 8), dtype=np.float32))
    hsp = shard_plan_2d(a, 4, blocksize=(8, 8))
    out = halo_spmm(hsp, a.data, b, mesh2x4, axis="model")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-5
    )


def test_sharded_train_step_loss_drops(mesh2x4):
    cfg = ShardedMLPConfig(
        in_features=64, hidden=32, num_classes=10, density=0.2, blocksize=(8, 16)
    )
    params, rsp, mask, tx, opt_state = make_sharded_train_state(
        cfg, mesh2x4, jax.random.PRNGKey(0)
    )
    step = make_sharded_train_step(cfg, mesh2x4, rsp, tx)

    rng = np.random.default_rng(0)
    protos = rng.normal(size=(10, 64)).astype(np.float32)
    losses = []
    for i in range(30):
        y = rng.integers(0, 10, size=(16,))
        x = protos[y] + 0.3 * rng.normal(size=(16, 64)).astype(np.float32)
        params, opt_state, loss = step(
            params, opt_state, mask, jnp.asarray(x), jnp.asarray(y.astype(np.int32))
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses


def test_sharded_train_step_mask_preserved(mesh2x4):
    # updates must never leak outside the sparsity pattern
    cfg = ShardedMLPConfig(
        in_features=64, hidden=32, num_classes=10, density=0.2, blocksize=(8, 16)
    )
    params, rsp, mask, tx, opt_state = make_sharded_train_state(
        cfg, mesh2x4, jax.random.PRNGKey(0)
    )
    step = make_sharded_train_step(cfg, mesh2x4, rsp, tx)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(8,)).astype(np.int32))
    for _ in range(3):
        params, opt_state, _ = step(params, opt_state, mask, x, y)
    w1 = np.asarray(params["w1_blocks"])
    np.testing.assert_array_equal(w1 * (1 - np.asarray(mask)), 0)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_ring_flash_attention_matches_reference(rng):
    from tpusparse.parallel.attention import ring_flash_attention
    from tpusparse.kernels.flash_attention import _reference_attention

    mesh8 = make_mesh((8,), ("seq",))
    b, h, s, d = 1, 2, 8 * 128, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        for _ in range(3)
    )
    out = np.asarray(ring_flash_attention(q, k, v, mesh8))
    ref = np.asarray(_reference_attention(q, k, v, False, 1.0 / np.sqrt(d)))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-5


def test_ring_flash_attention_causal(rng):
    """Causal ring: each chunk's global positions flow into the kernel via
    its scalar-prefetched offsets; future chunks contribute nothing."""
    from tpusparse.parallel.attention import ring_flash_attention
    from tpusparse.kernels.flash_attention import _reference_attention

    mesh8 = make_mesh((8,), ("seq",))
    b, h, s, d = 1, 1, 8 * 128, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        for _ in range(3)
    )
    out = np.asarray(ring_flash_attention(q, k, v, mesh8, causal=True))
    ref = np.asarray(_reference_attention(q, k, v, True, 1.0 / np.sqrt(d)))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-5
    gr = jax.grad(
        lambda *a: jnp.sum(ring_flash_attention(*a, mesh8, causal=True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    gf = jax.grad(
        lambda *a: jnp.sum(
            _reference_attention(*a, True, 1.0 / np.sqrt(d)) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), gr, gf):
        err = np.abs(np.asarray(a) - np.asarray(b_)).max() / np.abs(
            np.asarray(b_)
        ).max()
        assert err < 2e-4, (name, err)


def test_ring_flash_attention_grads(rng):
    """The ring backward: dq accumulates locally, dk/dv partial sums
    rotate with their chunks and land back on the owner after P hops."""
    from tpusparse.parallel.attention import ring_flash_attention
    from tpusparse.kernels.flash_attention import _reference_attention

    mesh8 = make_mesh((8,), ("seq",))
    b, h, s, d = 1, 1, 8 * 128, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        for _ in range(3)
    )
    gr = jax.grad(
        lambda *a: jnp.sum(ring_flash_attention(*a, mesh8) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    gf = jax.grad(
        lambda *a: jnp.sum(
            _reference_attention(*a, False, 1.0 / np.sqrt(d)) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), gr, gf):
        err = np.abs(np.asarray(a) - np.asarray(b_)).max() / np.abs(
            np.asarray(b_)
        ).max()
        assert err < 2e-4, (name, err)


def test_ulysses_fused_matches_reference(rng):
    from tpusparse.parallel.attention import ulysses_attention
    from tpusparse.kernels.flash_attention import _reference_attention

    mesh8 = make_mesh((8,), ("seq",))
    b, h, s, d = 1, 8, 256, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        for _ in range(3)
    )
    for causal in (False, True):
        out = np.asarray(
            ulysses_attention(q, k, v, mesh8, fused=True, causal=causal)
        )
        ref = np.asarray(
            _reference_attention(q, k, v, causal, 1.0 / np.sqrt(d))
        )
        assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-5, causal


def test_ring_flash_preserves_dtype(rng):
    from tpusparse.parallel.attention import ring_flash_attention

    mesh8 = make_mesh((8,), ("seq",))
    q = jnp.zeros((1, 1, 8 * 128, 64), jnp.bfloat16)
    out = ring_flash_attention(q, q, q, mesh8)
    assert out.dtype == jnp.bfloat16


def test_ulysses_per_head_mask(rng):
    """A mask with a FULL heads dimension must be resharded to each
    device's local heads (it was applied to head-sharded scores unsliced,
    returning a wrong-shaped result)."""
    from tpusparse.parallel.attention import ulysses_attention

    mesh8 = make_mesh((8,), ("seq",))
    b, h, s, d = 1, 8, 64, 16
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        for _ in range(3)
    )
    mask = jnp.asarray(rng.random((b, h, s, s)) > 0.2)
    out = ulysses_attention(q, k, v, mesh8, mask=mask)
    assert out.shape == (b, h, s, d)
    scores = np.einsum(
        "bhqd,bhkd->bhqk", np.asarray(q, np.float64), np.asarray(k, np.float64)
    ) / np.sqrt(d)
    scores = np.where(np.asarray(mask), scores, -1e9)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v, np.float64))
    assert np.abs(np.asarray(out) - ref).max() / np.abs(ref).max() < 1e-4


# ---------------------------------------------------------------------------
# node-sharded GCN
# ---------------------------------------------------------------------------


def test_sharded_gcn_matches_single_device(rng):
    from tpusparse.models.gcn import GCN, normalized_adjacency, random_graph
    from tpusparse.parallel.gcn import make_sharded_gcn_forward
    from tpusparse.parallel.spmm import shard_plan_rows

    n = 64
    adj = random_graph(7, n, avg_degree=6)
    a_hat = normalized_adjacency(adj)
    x = jnp.asarray(rng.random((n, 12), dtype=np.float32))
    model = GCN(hidden=(16,), num_classes=4)
    params = model.init(jax.random.PRNGKey(0), a_hat, x)
    ref = model.apply(params, a_hat, x)

    mesh = make_mesh((len(jax.devices()),), ("model",))
    rsp = shard_plan_rows(a_hat, mesh.shape["model"], blocksize=(8, 8))
    a_blocks = rsp.pack_values(a_hat.data)
    fwd = jax.jit(make_sharded_gcn_forward(model, rsp, mesh))
    got = fwd(params, a_blocks, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_sharded_gcn_trains(rng):
    from tpusparse.models.gcn import (
        GCN,
        normalized_adjacency,
        train_step,
        two_cluster_graph,
    )
    from tpusparse.parallel.gcn import make_sharded_gcn_train_step
    from tpusparse.parallel.spmm import shard_plan_rows
    import optax

    a, labels = two_cluster_graph(1, nodes_per_cluster=32)
    a_hat = normalized_adjacency(a)
    n = a.shape[0]
    x = jnp.eye(n, 8)
    y = jnp.asarray(labels)
    mask = jnp.ones((n,), jnp.float32)
    model = GCN(hidden=(8,), num_classes=2)
    params = model.init(jax.random.PRNGKey(1), a_hat, x)
    tx = optax.adam(1e-2)

    mesh = make_mesh((len(jax.devices()),), ("model",))
    rsp = shard_plan_rows(a_hat, mesh.shape["model"], blocksize=(8, 8))
    a_blocks = rsp.pack_values(a_hat.data)
    sstep = jax.jit(make_sharded_gcn_train_step(model, rsp, mesh, tx))

    # single-device twin for loss parity on the first steps
    dstep = jax.jit(train_step(model, tx))
    dparams, dopt = params, tx.init(params)
    sparams, sopt = params, tx.init(params)
    slosses = []
    for i in range(5):
        sparams, sopt, sloss = sstep(sparams, sopt, a_blocks, x, y, mask)
        dparams, dopt, dloss = dstep(dparams, dopt, a_hat, x, y, mask)
        slosses.append(float(sloss))
        np.testing.assert_allclose(
            float(sloss), float(dloss), rtol=2e-3, atol=2e-4
        )
    assert slosses[-1] < slosses[0]


# ---- distributed solvers (parallel/linalg.py) ----


def _spd_csr(seed, n=128, density=0.06):
    from tpusparse import sp_add, transpose_csr
    from tpusparse.linalg import speye

    b = random_csr(seed, (n, n), density)
    s = sp_add(b, transpose_csr(b))
    return sp_add(s, speye(n), 1.0, 2.0 * n * density + 1.0)


def test_sharded_matvec_matches_reference():
    from tpusparse.parallel.linalg import make_sharded_matvec

    mesh = make_mesh((8,), ("model",))
    a = _spd_csr(0)
    rsp = shard_plan_rows(a, 8, blocksize=(8, 8))
    mv = make_sharded_matvec(rsp, a.data, mesh)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    ref = np.asarray(spmm_reference(a, v[:, None]))[:, 0]
    np.testing.assert_allclose(np.asarray(mv(v)), ref, rtol=1e-4, atol=1e-5)
    # multivector
    vk = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(mv(vk)), np.asarray(spmm_reference(a, vk)),
        rtol=1e-4, atol=1e-5,
    )
    with pytest.raises(ValueError, match="length-128"):
        mv(jnp.zeros((64,), jnp.float32))


def test_sharded_cg_parity():
    from tpusparse import linalg
    from tpusparse.parallel.linalg import sharded_cg

    mesh = make_mesh((8,), ("model",))
    a = _spd_csr(1)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    x_sh, _ = sharded_cg(a, b, mesh, blocksize=(8, 8), tol=1e-8, maxiter=300)
    x_ref, _ = linalg.cg(a, b, tol=1e-8, maxiter=300)
    np.testing.assert_allclose(
        np.asarray(x_sh), np.asarray(x_ref), rtol=1e-3, atol=1e-4
    )
    # true residual
    r = np.asarray(spmm_reference(a, x_sh[:, None]))[:, 0] - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-4


def test_sharded_cg_preconditioned_under_jit():
    from tpusparse.linalg import jacobi_preconditioner
    from tpusparse.parallel.linalg import sharded_cg

    mesh = make_mesh((8,), ("model",))
    a = _spd_csr(2)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    M = jacobi_preconditioner(a)

    @jax.jit
    def solve(bb):
        x, _ = sharded_cg(a, bb, mesh, blocksize=(8, 8), M=M, tol=1e-8, maxiter=300)
        return x

    x = solve(b)
    r = np.asarray(spmm_reference(a, x[:, None]))[:, 0] - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-4


def test_sharded_power_iteration_parity():
    from tpusparse import linalg
    from tpusparse.parallel.linalg import sharded_power_iteration

    mesh = make_mesh((8,), ("model",))
    a = _spd_csr(3)
    lam_sh, v_sh = sharded_power_iteration(a, mesh, blocksize=(8, 8), iters=150)
    lam_ref, _ = linalg.power_iteration(a, iters=150)
    np.testing.assert_allclose(float(lam_sh), float(lam_ref), rtol=1e-3)
    # eigen residual ||A v - lam v||
    av = np.asarray(spmm_reference(a, np.asarray(v_sh)[:, None]))[:, 0]
    assert np.linalg.norm(av - float(lam_sh) * np.asarray(v_sh)) < 1e-2


def test_sharded_dia_matvec_and_cg():
    import scipy.sparse as ssp

    import tpusparse as ts
    from tpusparse.parallel.dia import make_sharded_dia_matvec, sharded_dia_cg

    n1 = 16
    T = ssp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n1, n1), format="csr")
    I = ssp.eye(n1, format="csr")
    a_sp = (ssp.kron(I, T) + ssp.kron(T, I) + 0.1 * ssp.eye(n1 * n1)).tocsr()
    a_sp = a_sp.astype(np.float32)
    a_sp.sort_indices()
    a = ts.csr_to_dia(ts.CSR.from_scipy(a_sp))
    mesh = make_mesh((8,), ("model",))
    mv = make_sharded_dia_matvec(a, mesh)
    rng = np.random.default_rng(0)
    n = n1 * n1
    v = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    ref = a_sp.astype(np.float64) @ np.asarray(v, np.float64)
    np.testing.assert_allclose(
        np.asarray(jax.jit(mv)(v)), ref, rtol=1e-4, atol=1e-5
    )
    vk = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(mv(vk)), a_sp @ np.asarray(vk), rtol=1e-4, atol=1e-4
    )
    b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    x, _ = sharded_dia_cg(a, b, mesh, tol=1e-7, maxiter=500)
    res = np.linalg.norm(a_sp @ np.asarray(x) - np.asarray(b))
    assert res / np.linalg.norm(np.asarray(b)) < 1e-4
    # rows not divisible by ndev: zero-padded tail
    a2_sp = ssp.diags(
        [np.ones(249), 3 * np.ones(250), np.ones(249)], [-1, 0, 1]
    ).tocsr().astype(np.float32)
    a2_sp.sort_indices()
    a2 = ts.csr_to_dia(ts.CSR.from_scipy(a2_sp))
    mv2 = make_sharded_dia_matvec(a2, mesh)
    v2 = jnp.asarray(rng.normal(size=(250,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(mv2(v2)), a2_sp @ np.asarray(v2), rtol=1e-4, atol=1e-5
    )
    # bandwidth > rows-per-device is rejected
    wide = ts.csr_to_dia(
        ts.CSR.from_scipy(
            ssp.diags([np.ones(250 - 40), np.ones(250)], [-40, 0])
            .tocsr()
            .astype(np.float32)
        )
    )
    with pytest.raises(ValueError, match="bandwidth"):
        make_sharded_dia_matvec(wide, mesh)


# ---------------------------------------------------------------------------
# r3: scaling projection — the comm model must count exactly the bytes the
# shard_map program moves (BASELINE configs[4], falsifiable before hardware)
# ---------------------------------------------------------------------------


class TestScalingProjection:
    def test_halo_comm_matches_traced_program(self, mesh8):
        from tpusparse.parallel import count_ppermute_bytes
        from tpusparse.parallel.projection import halo_comm_bytes_per_dev
        from tpusparse.parallel.spmm import halo_spmm, shard_plan_2d

        a = random_csr(3, (256, 256), 0.06)
        hsp = shard_plan_2d(a, 8, (8, 16))
        n = 24
        b = jnp.zeros((256, n), jnp.float32)
        mesh = make_mesh((8,), ("model",))
        counted = count_ppermute_bytes(
            lambda d, bb: halo_spmm(hsp, d, bb, mesh), a.data, b
        )
        assert counted > 0
        assert counted == halo_comm_bytes_per_dev(hsp, n)

    def test_sharded_spmm_moves_nothing(self):
        from tpusparse.parallel import count_ppermute_bytes
        from tpusparse.parallel.spmm import sharded_spmm, shard_plan_rows

        a = random_csr(4, (256, 256), 0.06)
        rsp = shard_plan_rows(a, 8, (8, 16))
        b = jnp.zeros((256, 24), jnp.float32)
        mesh = make_mesh((8,), ("model",))
        counted = count_ppermute_bytes(
            lambda d, bb: sharded_spmm(rsp, d, bb, mesh), a.data, b
        )
        assert counted == 0

    def test_projection_shape_and_monotonicity(self):
        from tpusparse.parallel import (
            project_halo_spmm,
            project_sharded_spmm,
            projection_table,
        )

        a = random_csr(5, (4096, 4096), 0.02)
        for projs in (
            project_sharded_spmm(a, 512, (2, 4, 8), (128, 128)),
            project_halo_spmm(a, 512, (2, 4, 8), (128, 128)),
        ):
            assert [p.ndev for p in projs] == [2, 4, 8]
            for p in projs:
                assert 0.0 < p.efficiency <= 1.25  # rounding headroom only
                assert p.t_total_s >= p.t_compute_s / (p.ndev + 1)
            # more devices never increases per-device critical-path time
            assert projs[-1].t_total_s <= projs[0].t_total_s * 1.01
        table = projection_table(projs, "halo")
        assert "eff" in table and table.count("\n") >= 3
