"""Dense matmul tests: trans/batch variants vs numpy, Pallas GEMM parity.

Shape grid mirrors the reference cuBLAS test (tests/cublas_kernel_test.py:
62-69): small sanity shapes, batched 3-D/4-D, transposed variants, and
BERT-attention shapes (scaled down for interpreter-mode runtime).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse import dense
from tpusparse.kernels.gemm import gemm_pallas


def _np_matmul(a, b, transa=False, transb=False):
    if transa:
        a = np.swapaxes(a, -1, -2)
    if transb:
        b = np.swapaxes(b, -1, -2)
    return a @ b


CASES = [
    # (a_shape, b_shape, transa, transb) — reference shape matrix
    ((4, 2), (2, 3), False, False),
    ((8, 64), (64, 8), False, False),  # BASELINE configs[0] gate
    ((64, 8), (64, 8), True, False),
    ((8, 64), (8, 64), False, True),
    ((64, 8), (8, 64), True, True),
    ((2, 4, 2), (2, 2, 3), False, False),
    ((2, 4, 2), (2, 3, 2), False, True),
    ((2, 2, 4, 2), (2, 2, 3, 2), False, True),
    ((3, 4, 5), (5, 6), False, False),  # 3-D × 2-D (matmuls.py:43-47)
    ((4, 5), (3, 5, 6), False, False),  # 2-D × 3-D (matmuls.py:48-52)
    ((2, 2, 2, 3, 4), (2, 2, 2, 4, 5), False, False),  # ≥5-D path
    ((4, 2, 64, 64), (4, 2, 64, 32), False, False),  # BERT attn (scaled)
    ((2, 2, 64, 32), (2, 2, 64, 32), False, True),  # BERT QK^T (scaled)
]


@pytest.mark.parametrize("a_shape,b_shape,transa,transb", CASES)
def test_matmul_vs_numpy(rng, a_shape, b_shape, transa, transb):
    a = rng.random(a_shape, dtype=np.float32)
    b = rng.random(b_shape, dtype=np.float32)
    out = dense.matmul(jnp.asarray(a), jnp.asarray(b), transa=transa, transb=transb)
    expected = _np_matmul(a, b, transa, transb)
    assert out.shape == expected.shape
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_matmul_vector_fallback(rng):
    a = rng.random((8,), dtype=np.float32)
    b = rng.random((8, 4), dtype=np.float32)
    out = dense.matmul(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "m,k,n",
    [(8, 64, 8), (16, 128, 32), (128, 128, 128), (100, 70, 50), (256, 384, 256)],
)
def test_gemm_pallas_vs_numpy(rng, m, k, n):
    a = rng.random((m, k), dtype=np.float32)
    b = rng.random((k, n), dtype=np.float32)
    out = gemm_pallas(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-5, atol=1e-4)


def test_gemm_pallas_multiple_k_blocks(rng):
    a = rng.random((64, 300), dtype=np.float32)
    b = rng.random((300, 64), dtype=np.float32)
    out = gemm_pallas(jnp.asarray(a), jnp.asarray(b), block_k=128)
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-5, atol=1e-4)


def test_bmm_validates(rng):
    a = jnp.ones((2, 3, 4))
    with pytest.raises(ValueError):
        dense.bmm(a, jnp.ones((4, 5)))
    with pytest.raises(ValueError):
        dense.bmm(a, jnp.ones((3, 4, 5)))
    out = dense.bmm(a, jnp.ones((2, 4, 5)))
    assert out.shape == (2, 3, 5)


def test_split_bf16_rtn_roundtrip_under_jit(rng):
    """The XLA-safe hi/lo split must survive jit: the naive arithmetic
    split is folded away by XLA's simplifier on TPU (lo -> ~0, degrading
    the 3-pass mode from ~7e-7 to ~3e-4 rel err). The bit-masked split's
    roundtrip error must stay at the lo-rounding scale (~2^-17 relative),
    NOT the bf16 scale (2^-9) that folding produces."""
    from tpusparse.dense import split_bf16_rtn

    x = jnp.asarray(rng.uniform(0.1, 4.0, size=(64, 256)).astype(np.float32))
    hi, lo = jax.jit(split_bf16_rtn)(x)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    rt = np.asarray(hi.astype(jnp.float32) + lo.astype(jnp.float32))
    err = np.abs(rt - np.asarray(x)).max()
    assert err < 4.0 * 2.0**-17, err
    # lo really carries the remainder (not folded to zero)
    assert np.abs(np.asarray(lo, np.float32)).max() > 2.0**-12


def test_global_bf16x3_precision_does_not_crash_dense():
    """'bf16x3' is primarily a Pallas precision name; setting it globally
    must resolve on the XLA paths too (once a raw KeyError)."""
    from tpusparse import mm
    from tpusparse.utils.config import set_config

    set_config(precision="bf16x3")
    try:
        out = mm(jnp.ones((4, 8)), jnp.ones((8, 4)))
        np.testing.assert_allclose(np.asarray(out), 8.0)
    finally:
        set_config(precision="high")


def test_matmul_1d_with_transpose_flags(rng):
    """transb must apply to the 2-D operand even when the other operand
    is 1-D (the flags were silently ignored on the 1-D fallback)."""
    from tpusparse import dense

    v = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    M = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    out = np.asarray(dense.matmul(v, M, transb=True))
    ref = np.asarray(v, np.float64) @ np.asarray(M, np.float64).T
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError, match="transa"):
        dense.matmul(v, M, transa=True)


def test_gemm_tile_persistence_roundtrip(tmp_path, monkeypatch, rng):
    """Autotuned tiles persist per (m, k, n, dtype) in the calibration
    file and are picked up EAGERLY by gemm_pallas (r3: tile resolution
    happens outside the jit boundary, so a fresh tune is never shadowed
    by a stale trace). The sweep itself needs the chip; here the cache
    and resolution plumbing are exercised with a hand-written entry."""
    from tpusparse.kernels import gemm as gemm_mod
    from tpusparse.utils.calibrate import load_gemm_tiles, save_gemm_tile

    path = str(tmp_path / "cal.json")
    monkeypatch.setenv("TPUSPARSE_CALIBRATION", path)
    save_gemm_tile("256x256x256x float32".replace(" ", ""), (256, 256, 128))
    tiles = load_gemm_tiles()
    assert tiles == {"256x256x256xfloat32": [256, 256, 128]}
    # resolution consults the persisted entry (fresh in-memory cache)
    monkeypatch.setattr(gemm_mod, "_TILE_CACHE", {})
    monkeypatch.setattr(gemm_mod, "_TILE_CACHE_LOADED", False)
    assert gemm_mod._tuned_tile(256, 256, 256, "float32") == (256, 256, 128)
    assert gemm_mod._tuned_tile(512, 256, 256, "float32") is None
    # correctness is tile-independent: run the kernel at the tuned tile
    a = rng.standard_normal((256, 256), dtype=np.float32)
    b = rng.standard_normal((256, 256), dtype=np.float32)
    out = gemm_pallas(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.float64) @ b.astype(np.float64)
    err = np.abs(np.asarray(out, np.float64) - ref).max() / np.abs(ref).max()
    assert err < 1e-5
