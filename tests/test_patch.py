"""Tests for the drop-in flax integration layer (tpusparse/patch.py).

Covers the reference's monkey-patch deployment mode (reference
benchmarks/pytorch_linear.py) with actual parity assertions the
reference lacks (it only prints the output).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.patch import (
    PatchedDense,
    patch_flax_dense,
    sparsify_dense_params,
    tpusparse_dot_general,
)


def test_dot_general_simple_matches_lax(rng):
    lhs = jnp.asarray(rng.normal(size=(4, 6, 8)).astype(np.float32))
    rhs = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    dn = (((2,), (0,)), ((), ()))
    got = tpusparse_dot_general(lhs, rhs, dn)
    want = jax.lax.dot_general(lhs, rhs, dn, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_dot_general_fallback_general_case(rng):
    # batched contraction nn.Dense never emits — must fall back, not crash
    lhs = jnp.asarray(rng.normal(size=(3, 4, 5)).astype(np.float32))
    rhs = jnp.asarray(rng.normal(size=(3, 5, 2)).astype(np.float32))
    dn = (((2,), (1,)), ((0,), (0,)))
    got = tpusparse_dot_general(lhs, rhs, dn)
    want = jax.lax.dot_general(lhs, rhs, dn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_patched_dense_parity_and_grads(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 16)).astype(np.float32))
    layer = PatchedDense(8)
    params = layer.init(jax.random.PRNGKey(0), x)
    ref = nn.Dense(8)

    out, ref_out = layer.apply(params, x), ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5)

    g = jax.grad(lambda p: jnp.sum(layer.apply(p, x) ** 2))(params)
    gr = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


def test_patch_context_rebinds_and_restores():
    import flax.linen

    original = flax.linen.Dense
    with patch_flax_dense():
        assert flax.linen.Dense is PatchedDense
        assert flax.linen.linear.Dense is PatchedDense
        layer = flax.linen.Dense(4)
        assert isinstance(layer, PatchedDense)
    assert flax.linen.Dense is original
    assert flax.linen.linear.Dense is original


def test_patch_context_restores_on_error():
    import flax.linen

    original = flax.linen.Dense
    with pytest.raises(RuntimeError):
        with patch_flax_dense():
            raise RuntimeError("boom")
    assert flax.linen.Dense is original


def test_sparsify_dense_params_density(rng):
    x = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    layer = nn.Dense(8)
    params = layer.init(jax.random.PRNGKey(0), x)
    pruned, sparse = sparsify_dense_params(params, ["kernel"], density=0.25)
    (name, csr), = sparse.items()
    assert "kernel" in name
    assert csr.shape == (16, 8)
    assert csr.nnz == pytest.approx(0.25 * 16 * 8, abs=2)
    # pruned tree's kernel matches the CSR densified
    kernel = pruned["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(csr.to_dense()), np.asarray(kernel))


def test_sparsify_requires_exactly_one_mode(rng):
    params = nn.Dense(4).init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    with pytest.raises(ValueError):
        sparsify_dense_params(params, ["kernel"])
    with pytest.raises(ValueError):
        sparsify_dense_params(params, ["kernel"], threshold=0.1, density=0.5)


def test_sparsify_dense_params_threshold(rng):
    w = rng.normal(size=(12, 10)).astype(np.float32)
    params = {"params": {"layer": {"kernel": jnp.asarray(w)}}}
    pruned, sparse = sparsify_dense_params(params, ["kernel"], threshold=0.5)
    (name, csr), = sparse.items()
    expected_mask = np.abs(w) >= 0.5
    assert csr.nnz == expected_mask.sum()
    np.testing.assert_allclose(
        np.asarray(csr.to_dense()), w * expected_mask, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pruned["params"]["layer"]["kernel"]), w * expected_mask
    )
