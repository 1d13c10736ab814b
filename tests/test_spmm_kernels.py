"""Pallas SpMM/SDDMM kernel tests vs the XLA reference ops (interpret mode).

Shape grid mirrors the reference sparse suites: ((n,n), (n,2n), (n,n/2),
(2n,n)) pairs (tests/cusparse_kernel_test.py:32-38, tiledsppm_kernel_test.py:
34-39) at several densities, scaled for interpreter-mode runtime.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse import CSR, random_csr, spmm_reference, sddmm_reference
from tpusparse.kernels.naive_spmm import ell_pack, naive_spmm_pallas
from tpusparse.kernels.sddmm import sddmm_pallas
from tpusparse.kernels.tiled_spmm import tiled_spmm_pallas
from tpusparse.plan import build_plan, build_plan_pair, plan_cache_info

N = 64
SHAPE_GRID = [(N, N), (N, 2 * N), (N, N // 2), (2 * N, N)]


def _case(key, shape_a, density, n_cols, rng):
    a = random_csr(key, shape_a, density)
    b = jnp.asarray(rng.random((shape_a[1], n_cols), dtype=np.float32))
    return a, b


@pytest.mark.parametrize("shape_a", SHAPE_GRID)
@pytest.mark.parametrize("density", [0.01, 0.1])
def test_naive_spmm_vs_reference(rng, shape_a, density):
    a, b = _case(0, shape_a, density, 48, rng)
    out = naive_spmm_pallas(ell_pack(a), a.shape, b)
    expected = spmm_reference(a, b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min", "mul"])
def test_naive_spmm_reducers(rng, reduce):
    a, b = _case(1, (32, 48), 0.15, 16, rng)
    out = naive_spmm_pallas(ell_pack(a), a.shape, b, reduce=reduce)
    expected = spmm_reference(a, b, reduce=reduce)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


def test_naive_spmm_empty_rows(rng):
    # rows with zero nonzeros must produce the reduction identity
    mat = np.zeros((16, 24), np.float32)
    mat[3, [1, 5]] = [2.0, 3.0]
    mat[10, 7] = 4.0
    a = CSR.from_dense(mat)
    b = jnp.asarray(rng.random((24, 16), dtype=np.float32))
    out = naive_spmm_pallas(ell_pack(a), a.shape, b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("shape_a", SHAPE_GRID)
@pytest.mark.parametrize("density", [0.005, 0.05, 0.3])
def test_tiled_spmm_vs_reference(rng, shape_a, density):
    a, b = _case(2, shape_a, density, 40, rng)
    plan = build_plan(a, blocksize=(8, 16))
    out = tiled_spmm_pallas(plan, plan.pack_values(a.data), b)
    expected = spmm_reference(a, b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("blocksize", [(8, 8), (8, 32), (16, 16), (32, 8)])
def test_tiled_spmm_blocksizes(rng, blocksize):
    a, b = _case(3, (96, 80), 0.05, 24, rng)
    plan = build_plan(a, blocksize=blocksize)
    out = tiled_spmm_pallas(plan, plan.pack_values(a.data), b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-5
    )


def test_tiled_spmm_ragged_dims(rng):
    # dims not multiples of blocksize exercise the padding path
    a, b = _case(4, (50, 70), 0.08, 17, rng)
    plan = build_plan(a, blocksize=(16, 16))
    out = tiled_spmm_pallas(plan, plan.pack_values(a.data), b)
    assert out.shape == (50, 17)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-5
    )


def test_tiled_spmm_skewed_rows(rng):
    # one dense row-block, rest nearly empty: exercises the ELL skip logic
    mat = np.zeros((64, 64), np.float32)
    mat[0, :] = rng.random(64, dtype=np.float32)  # dense row
    mat[40, 13] = 7.0
    a = CSR.from_dense(mat)
    b = jnp.asarray(rng.random((64, 32), dtype=np.float32))
    plan = build_plan(a, blocksize=(8, 8))
    assert plan.ell_width == 8  # the dense row forces full width
    assert int(np.asarray(plan.nslots).min()) == 0  # empty row-blocks skip all
    out = tiled_spmm_pallas(plan, plan.pack_values(a.data), b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-5
    )


def test_plan_pack_unpack_roundtrip(rng):
    a = random_csr(5, (64, 96), 0.1)
    plan = build_plan(a, blocksize=(8, 16))
    blocks = plan.pack_values(a.data)
    np.testing.assert_array_equal(
        np.asarray(plan.unpack_values(blocks)), np.asarray(a.data)
    )


def test_plan_cache_hit():
    from tpusparse.plan import clear_plan_cache

    clear_plan_cache()
    a = random_csr(6, (64, 64), 0.05)
    p1 = build_plan(a, blocksize=(8, 8))
    p2 = build_plan(a, blocksize=(8, 8))
    assert p1 is p2
    info = plan_cache_info()
    assert info["hits"] == 1 and info["misses"] == 1


def test_plan_report_fields():
    a = random_csr(7, (128, 128), 0.02)
    plan = build_plan(a, blocksize=(8, 16))
    rep = plan.report(n_cols=64)
    for key in (
        "density",
        "block_fill",
        "ell_pad_overhead",
        "projected_gflops_effective",
        "projected_nnz_per_s",
        "arithmetic_intensity",
        "bound",
    ):
        assert key in rep
    assert 0 < rep["block_fill"] <= 1


@pytest.mark.parametrize("shape_a,n_cols", [((64, 64), 32), ((64, 96), 40)])
def test_sddmm_pallas_vs_reference(rng, shape_a, n_cols):
    a = random_csr(8, shape_a, 0.08)
    plan, _, _ = build_plan_pair(a, blocksize=(8, 16))
    dc = jnp.asarray(rng.random((shape_a[0], n_cols), dtype=np.float32))
    bt = jnp.asarray(rng.random((shape_a[1], n_cols), dtype=np.float32))
    blocks = sddmm_pallas(plan, dc, bt)
    vals = plan.unpack_values(blocks)
    expected = sddmm_reference(a, dc, jnp.swapaxes(bt, 0, 1))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


def test_sddmm_pallas_zeroes_padding(rng):
    # padded ELL slots must carry zero gradient blocks
    a = random_csr(9, (32, 64), 0.03)
    plan, _, _ = build_plan_pair(a, blocksize=(8, 8))
    dc = jnp.ones((32, 16))
    bt = jnp.ones((64, 16))
    blocks = np.asarray(sddmm_pallas(plan, dc, bt))
    nslots = np.asarray(plan.nslots)
    L = plan.ell_width
    for i in range(plan.num_row_blocks):
        for l in range(nslots[i], L):
            np.testing.assert_array_equal(blocks[i * L + l], 0)


def test_transpose_plan_consistency(rng):
    a = random_csr(10, (48, 80), 0.1)
    plan, plan_t, t_perm = build_plan_pair(a, blocksize=(8, 16))
    assert plan_t.shape == (80, 48)
    b = jnp.asarray(rng.random((48, 24), dtype=np.float32))
    out = tiled_spmm_pallas(plan_t, plan_t.pack_values(a.data[t_perm]), b)
    expected = np.asarray(a.to_dense()).T @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_div_reducer_matches_reciprocal_product(rng):
    import tpusparse as ts

    a = ts.random_csr(11, (16, 24), 0.3)
    b = jnp.asarray(rng.uniform(0.5, 2.0, size=(24, 8)).astype(np.float32))
    ref = np.asarray(ts.spmm_reference(a, b, reduce="mul"))
    got = np.asarray(ts.spmm_reference(a, b, reduce="div"))
    np.testing.assert_allclose(got, 1.0 / ref, rtol=1e-4)
    # Pallas naive kernel agrees
    got_k = np.asarray(ts.naive_spmm(a, b, reduce="div"))
    np.testing.assert_allclose(got_k, got, rtol=1e-4)


def test_minmax_arg_tracking(rng):
    import tpusparse as ts

    a = ts.random_csr(12, (12, 16), 0.4)
    b = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    vals, arg = ts.spmm_reference(a, b, reduce="max", return_arg=True)
    vals, arg = np.asarray(vals), np.asarray(arg)
    rows = np.repeat(np.arange(12), np.diff(np.asarray(a.indptr)))
    gathered = np.asarray(b)[np.asarray(a.indices)] * np.asarray(a.data)[:, None]
    for i in range(12):
        sel = np.nonzero(rows == i)[0]
        for c in range(4):
            if len(sel) == 0:
                assert vals[i, c] == 0 and arg[i, c] == a.nnz
            else:
                e = sel[np.argmax(gathered[sel, c])]
                assert np.isclose(vals[i, c], gathered[e, c], rtol=1e-5)
                assert gathered[arg[i, c], c] == gathered[e, c]
                assert rows[arg[i, c]] == i

    with pytest.raises(ValueError, match="min/max"):
        ts.spmm_reference(a, b, reduce="sum", return_arg=True)


def test_tiled_spmm_bf16x3_precision(rng):
    """Explicit 'bf16x3' exercises the manual 3-pass hi/lo-split branch of
    mxu.dot in interpret mode — on CPU the default config maps
    'high'->HIGHEST, so this name is the only CPU coverage of that branch.
    (A pre-split-operand executor variant was tried and REJECTED: stacked
    hi/lo-plane DMA measured 2.5x slower than in-kernel splitting on v5e,
    with degraded accuracy — the executor is HBM-bandwidth-bound and the
    strided two-plane copy wrecks DMA efficiency.)"""
    a, b = _case(21, (160, 224), 0.08, 72, rng)
    plan = build_plan(a, blocksize=(8, 16))
    out = tiled_spmm_pallas(
        plan, plan.pack_values(a.data), b, precision="bf16x3"
    )
    expected = np.asarray(a.to_dense(), np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(
        np.asarray(out), expected, rtol=1e-4, atol=5e-5
    )


@pytest.mark.parametrize("shape_a", SHAPE_GRID)
@pytest.mark.parametrize("density", [0.01, 0.1])
@pytest.mark.parametrize("rows_per_super", [1, 4])
def test_footprint_spmm_vs_reference(rng, shape_a, density, rows_per_super):
    from tpusparse.kernels.tiled_spmm import footprint_spmm_pallas
    from tpusparse.plan import footprint_plan

    a, b = _case(31, shape_a, density, 40, rng)
    fp = footprint_plan(build_plan(a, blocksize=(8, 16)), rows_per_super)
    out = footprint_spmm_pallas(fp, fp.pack_values(a.data), b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-5
    )


def test_footprint_plan_invariants(rng):
    from tpusparse.plan import footprint_plan

    a = random_csr(32, (256, 192), 0.07)
    plan = build_plan(a, blocksize=(8, 16))
    fp = footprint_plan(plan, rows_per_super=8)
    # same occupied blocks, fewer B-tile fetches than slots
    assert fp.nblocks == plan.nblocks
    assert fp.ntiles == int(np.asarray(fp.ucnt).sum()) <= fp.nblocks
    # slots sorted by column within each super-row; bslot/newcol consistent
    nslots = np.asarray(fp.nslots)
    bslot, newcol = np.asarray(fp.bslot), np.asarray(fp.newcol)
    for s in range(fp.num_supers):
        c = nslots[s]
        if c > 0:
            assert newcol[s, 0] == 1 and bslot[s, 0] == 0
            assert (np.diff(bslot[s, :c]) == newcol[s, 1:c]).all()
            assert bslot[s, c - 1] == np.asarray(fp.ucnt)[s] - 1
    # value pack/unpack roundtrip
    bv = fp.pack_values(a.data)
    np.testing.assert_array_equal(
        np.asarray(fp.unpack_values(bv)), np.asarray(a.data)
    )


def test_footprint_spmm_multi_n_tile(rng):
    from tpusparse.kernels.tiled_spmm import footprint_spmm_pallas
    from tpusparse.plan import footprint_plan
    from tpusparse.utils.config import set_config

    a = random_csr(33, (128, 256), 0.05)
    b = jnp.asarray(rng.random((256, 384), dtype=np.float32))
    fp = footprint_plan(build_plan(a, blocksize=(8, 32)), rows_per_super=4)
    set_config(spmm_block_n=128)  # force 3 N tiles
    try:
        out = footprint_spmm_pallas(fp, fp.pack_values(a.data), b)
    finally:
        set_config(spmm_block_n=512)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-5, atol=1e-5
    )


def test_derived_plan_caches_distinguish_intra_block_layout(rng):
    """Two matrices with IDENTICAL block structure but different element
    positions inside the blocks must not share a derived plan — the
    caches once hashed only block_cols+nslots and collided, silently
    scattering the second matrix's values to the first one's positions."""
    from tpusparse.kernels.tiled_spmm import (
        compact_spmm_pallas, footprint_spmm_pallas, grouped_spmm_pallas)
    from tpusparse.plan import compact_plan, footprint_plan, group_plan

    def mat(positions):
        d = np.zeros((8, 16), np.float32)
        for (r, c), v in positions:
            d[r, c] = v
        return CSR.from_dense(d)

    a1 = mat([((0, 0), 1.0), ((3, 5), 2.0)])
    a2 = mat([((1, 1), 3.0), ((4, 7), 4.0)])  # same single (8,16) block
    b = jnp.asarray(rng.random((16, 8), dtype=np.float32))
    for a in (a1, a2):
        plan = build_plan(a, blocksize=(8, 16))
        ref = np.asarray(a.to_dense(), np.float64) @ np.asarray(b, np.float64)
        fp = footprint_plan(plan, 2)
        np.testing.assert_allclose(
            np.asarray(footprint_spmm_pallas(fp, fp.pack_values(a.data), b)),
            ref, rtol=1e-5, atol=1e-6, err_msg="footprint")
        cp = compact_plan(plan)
        np.testing.assert_allclose(
            np.asarray(compact_spmm_pallas(cp, cp.pack_values(a.data), b)),
            ref, rtol=1e-5, atol=1e-6, err_msg="compact")
        gp = group_plan(plan, 2)
        np.testing.assert_allclose(
            np.asarray(grouped_spmm_pallas(gp, gp.pack_values(a.data), b)),
            ref, rtol=1e-5, atol=1e-6, err_msg="grouped")


def test_footprint_bf16_accumulates_in_f32(rng):
    """bf16 inputs through the footprint executor must match the tiled
    executor's accuracy class — it once accumulated directly into the
    bf16 output block, rounding every per-slot add (~15x worse error)."""
    from tpusparse.kernels.tiled_spmm import (
        footprint_spmm_pallas, tiled_spmm_pallas)
    from tpusparse.plan import footprint_plan

    d = (rng.random((8, 1024), dtype=np.float32) - 0.5).astype(np.float32)
    a32 = CSR.from_dense(d)
    a16 = CSR(
        data=jnp.asarray(a32.data).astype(jnp.bfloat16),
        indices=a32.indices, indptr=a32.indptr, shape=a32.shape,
    )
    b16 = jnp.asarray(rng.random((1024, 16), dtype=np.float32)).astype(
        jnp.bfloat16
    )
    plan = build_plan(a16, blocksize=(8, 16))
    fp = footprint_plan(plan, 1)
    ref = d.astype(np.float64) @ np.asarray(
        b16.astype(jnp.float32), np.float64
    )
    out_f = np.asarray(
        footprint_spmm_pallas(fp, fp.pack_values(a16.data), b16), np.float32
    )
    out_t = np.asarray(
        tiled_spmm_pallas(plan, plan.pack_values(a16.data), b16), np.float32
    )
    err_f = np.abs(out_f - ref).max() / np.abs(ref).max()
    err_t = np.abs(out_t - ref).max() / np.abs(ref).max()
    assert err_f < 3 * err_t + 1e-3, (err_f, err_t)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_naive_kernel_minmax_empty_rows_zero(rng, reduce):
    """The Pallas naive kernel must write 0 (not the ±inf loop identity)
    for empty rows under min/max — reference Reducer::write count==0."""
    mat = np.zeros((16, 24), np.float32)
    mat[3, [1, 5]] = [2.0, -3.0]
    a = CSR.from_dense(mat)
    b = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32))
    out = np.asarray(naive_spmm_pallas(ell_pack(a), a.shape, b, reduce=reduce))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(
        out, np.asarray(spmm_reference(a, b, reduce=reduce)),
        rtol=1e-5, atol=1e-5,
    )


# ---------------------------------------------------------------------------
# Resident (B-panel-in-VMEM) executor
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape_a", SHAPE_GRID)
@pytest.mark.parametrize("density", [0.05, 0.2])
def test_resident_spmm_vs_reference(rng, shape_a, density):
    from tpusparse.kernels.tiled_spmm import resident_spmm_pallas

    a, b = _case(11, shape_a, density, 48, rng)
    plan = build_plan(a, blocksize=(8, 8))
    out = resident_spmm_pallas(plan, plan.pack_values(a.data), b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-4, atol=1e-5
    )


def test_resident_matches_tiled_multi_n_tile(rng):
    """Several n tiles (grid j > 1): the panel reloads per n-tile and the
    two executors must agree exactly (same slot order, same dots)."""
    from tpusparse.kernels.tiled_spmm import resident_spmm_pallas

    a = random_csr(12, (64, 128), 0.15)
    b = jnp.asarray(rng.random((128, 96), dtype=np.float32))
    plan = build_plan(a, blocksize=(8, 16))
    bv = plan.pack_values(a.data)
    o_t = np.asarray(tiled_spmm_pallas(plan, bv, b, block_n=32))
    o_r = np.asarray(resident_spmm_pallas(plan, bv, b, block_n=32))
    np.testing.assert_array_equal(o_t, o_r)


def test_batched_resident_multi_tile_matches_folded(rng):
    """Batch-grid resident executor (r5): several batch elements AND
    several n-tiles per element exercises the double-buffered panel ring
    (cell c+1's panel prefetched at cell c); must equal the folded 2-D
    executor bitwise (same slot order, same dots) and the reference."""
    from tpusparse.kernels.tiled_spmm import resident_spmm_batched_pallas

    a = random_csr(13, (64, 128), 0.2)
    b3 = jnp.asarray(rng.random((3, 128, 96), dtype=np.float32))
    plan = build_plan(a, blocksize=(8, 16))
    bv = plan.pack_values(a.data)
    out = np.asarray(
        resident_spmm_batched_pallas(plan, bv, b3, block_n=32)
    )
    for g in range(3):
        o2 = np.asarray(
            resident_spmm_pallas_ref(plan, bv, b3[g], block_n=32)
        )
        np.testing.assert_array_equal(out[g], o2)


def resident_spmm_pallas_ref(plan, bv, b, **kw):
    from tpusparse.kernels.tiled_spmm import resident_spmm_pallas

    return resident_spmm_pallas(plan, bv, b, **kw)


def test_batched_resident_grad_matches_folded(rng):
    """custom_vjp of the batched path (dA via column-folded SDDMM, dB
    via the transpose plan) vs numeric dense grads."""
    import tpusparse as ts
    from tpusparse.ops import tiled_spmm

    # n=256 so _batched_resident_ok's width gate admits the batched path
    a = random_csr(14, (64, 64), 0.25)
    b3 = jnp.asarray(rng.random((2, 64, 256), dtype=np.float32))
    ad = np.asarray(a.to_dense(), np.float64)

    def loss(data, bb):
        aa = ts.CSR(data=data, indices=a.indices, indptr=a.indptr,
                    shape=a.shape)
        return jnp.sum(tiled_spmm(aa, bb) ** 2)

    dA, dB = jax.grad(loss, argnums=(0, 1))(a.data, b3)
    y0 = np.einsum("ij,bjk->bik", ad, np.asarray(b3, np.float64))
    gA = (2.0 * np.einsum("bik,bjk->bij", y0, np.asarray(b3, np.float64))
          ).sum(0)
    rows = np.repeat(np.arange(64), np.diff(np.asarray(a.indptr)))
    dA_ref = gA[rows, np.asarray(a.indices)]
    np.testing.assert_allclose(np.asarray(dA, np.float64), dA_ref,
                               rtol=1e-4, atol=1e-4)
    dB_ref = 2.0 * np.einsum("ji,bjk->bik", ad, y0)
    np.testing.assert_allclose(np.asarray(dB, np.float64), dB_ref,
                               rtol=1e-4, atol=1e-4)


def test_resident_vmem_overflow_raises(rng):
    from tpusparse.kernels.tiled_spmm import resident_spmm_pallas
    from tpusparse.utils.config import set_config

    a = random_csr(13, (64, 128), 0.2)
    b = jnp.asarray(rng.random((128, 64), dtype=np.float32))
    plan = build_plan(a, blocksize=(8, 8))
    set_config(vmem_limit_bytes=1 << 12)
    try:
        with pytest.raises(ValueError, match="VMEM"):
            resident_spmm_pallas(plan, plan.pack_values(a.data), b)
    finally:
        set_config(vmem_limit_bytes=64 << 20)


def test_resident_bf16_accumulates_f32(rng):
    from tpusparse.kernels.tiled_spmm import resident_spmm_pallas

    a = random_csr(14, (64, 64), 0.2)
    b16 = jnp.asarray(rng.random((64, 48), dtype=np.float32)).astype(jnp.bfloat16)
    plan = build_plan(a, blocksize=(8, 8))
    bv16 = plan.pack_values(a.data).astype(jnp.bfloat16)
    out = np.asarray(
        resident_spmm_pallas(plan, bv16, b16, out_dtype=jnp.float32)
    )
    ref = np.asarray(spmm_reference(a, b16.astype(jnp.float32)))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 0.02, err


def test_resident_spmm_public_grad(rng):
    """ops.resident_spmm forward + dA/dB gradients vs the tiled path."""
    import tpusparse as ts

    a = random_csr(15, (64, 96), 0.15)
    b = jnp.asarray(rng.random((96, 32), dtype=np.float32))

    out = np.asarray(ts.resident_spmm(a, b))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, b)), rtol=1e-4, atol=1e-5
    )

    def f_res(data, bb):
        a2 = CSR(data=data, indices=a.indices, indptr=a.indptr, shape=a.shape)
        return jnp.sum(ts.resident_spmm(a2, bb) ** 2)

    def f_tiled(data, bb):
        a2 = CSR(data=data, indices=a.indices, indptr=a.indptr, shape=a.shape)
        return jnp.sum(ts.tiled_spmm(a2, bb) ** 2)

    g_r = jax.grad(f_res, argnums=(0, 1))(a.data, b)
    g_t = jax.grad(f_tiled, argnums=(0, 1))(a.data, b)
    for gr, gt in zip(g_r, g_t):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gt), rtol=1e-5, atol=1e-6
        )


def test_resident_vmem_check_not_cached_by_jit(rng):
    """The fit check must fire even when a trace for the same signature
    is already cached from before the budget shrank (measured on TPU:
    a trace-time check was silently skipped via the jit cache)."""
    from tpusparse.kernels.tiled_spmm import resident_spmm_pallas
    from tpusparse.utils.config import set_config

    a = random_csr(16, (64, 128), 0.2)
    b = jnp.asarray(rng.random((128, 64), dtype=np.float32))
    plan = build_plan(a, blocksize=(8, 8))
    bv = plan.pack_values(a.data)
    resident_spmm_pallas(plan, bv, b)  # populate the jit cache
    set_config(vmem_limit_bytes=1 << 12)
    try:
        with pytest.raises(ValueError, match="VMEM"):
            resident_spmm_pallas(plan, bv, b)
    finally:
        set_config(vmem_limit_bytes=64 << 20)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_naive_spmm_return_arg(rng, reduce):
    # arg contract: global nnz index attaining the extremum, nnz for
    # empty rows (reference naive_sparse_mm.cu:125-129)
    mat = np.zeros((16, 24), np.float32)
    mat[3, [1, 5, 9]] = [2.0, -3.0, 0.5]
    mat[7, [0, 23]] = [1.5, 1.5]
    mat[10, 7] = -4.0
    a = CSR.from_dense(mat)
    b = jnp.asarray(rng.standard_normal((24, 16)).astype(np.float32))
    out, arg = naive_spmm_pallas(
        ell_pack(a), a.shape, b, reduce=reduce, return_arg=True, nnz=a.nnz
    )
    eout, earg = spmm_reference(a, b, reduce=reduce, return_arg=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(eout), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(arg), np.asarray(earg))
    # empty rows carry the fill value a.nnz
    assert (np.asarray(arg)[0] == a.nnz).all()


def test_spmm_public_return_arg(rng):
    a = random_csr(11, (32, 48), 0.1)
    b = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    for method in ("auto", "reference", "naive"):
        out, arg = __import__("tpusparse").spmm(
            a, b, method=method, reduce="max", return_arg=True
        )
        eout, earg = spmm_reference(a, b, reduce="max", return_arg=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(eout), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(arg), np.asarray(earg))
    # vector rhs keeps the contract through the SpMV lift
    v = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    ov, av = __import__("tpusparse").spmm(a, v, reduce="min", return_arg=True)
    ev, eav = spmm_reference(a, v[:, None], reduce="min", return_arg=True)
    np.testing.assert_allclose(np.asarray(ov), np.asarray(ev)[:, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(av), np.asarray(eav)[:, 0])
    # guard: return_arg without min/max
    with pytest.raises(ValueError, match="min"):
        __import__("tpusparse").spmm(a, b, reduce="sum", return_arg=True)


def test_precision_config_change_not_frozen_by_jit_cache(rng):
    """set_config(precision=...) must reach an executor whose signature is
    already jit-cached. The kernel entries take precision as a static arg
    defaulting to None; before the eager_precision wrapper, None froze the
    mode the FIRST trace resolved (measured on TPU: switching to 'default'
    after a 'high' run silently re-ran the 3-pass kernel)."""
    from tpusparse.kernels.gemm import gemm_pallas
    from tpusparse.utils.config import set_config

    a = random_csr(21, (64, 128), 0.3)
    b = jnp.asarray(rng.random((128, 128), dtype=np.float32))
    plan = build_plan(a, blocksize=(8, 8))
    bv = plan.pack_values(a.data)
    x = jnp.asarray(rng.random((64, 64), dtype=np.float32))

    # 'highest' (native fp32 dots) vs 'bf16x3' (explicit 3-pass split,
    # backend-independent): the split drops the lo*lo term, so outputs
    # must differ once the config change actually reaches the kernel
    set_config(precision="highest")
    try:
        y_exact = np.asarray(tiled_spmm_pallas(plan, bv, b))
        g_exact = np.asarray(gemm_pallas(x, x))
        set_config(precision="bf16x3")
        y_split = np.asarray(tiled_spmm_pallas(plan, bv, b))
        g_split = np.asarray(gemm_pallas(x, x))
    finally:
        set_config(precision="high")
    for exact, split in ((y_exact, y_split), (g_exact, g_split)):
        assert (exact != split).any(), "precision change ignored (stale jit cache)"
        np.testing.assert_allclose(split, exact, rtol=1e-4, atol=1e-5)
