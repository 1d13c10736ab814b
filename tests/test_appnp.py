"""APPNP model family: propagation algebra vs a dense fp64 oracle,
K-step semantics, and end-to-end learning on the planted partition."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpusparse.models.appnp import APPNP, appnp_propagate, train_step
from tpusparse.models.gcn import (
    normalized_adjacency,
    random_graph,
    two_cluster_graph,
)


def _dense64(a):
    return np.asarray(a.to_dense(), np.float64)


def test_propagation_matches_dense_power_iteration(rng):
    a_hat = normalized_adjacency(random_graph(0, 40, avg_degree=5))
    h = rng.normal(size=(40, 3)).astype(np.float32)
    z = appnp_propagate(a_hat, jnp.asarray(h), alpha=0.15, k=7)
    ad = _dense64(a_hat)
    zr = h.astype(np.float64)
    for _ in range(7):
        zr = 0.85 * ad @ zr + 0.15 * h
    np.testing.assert_allclose(np.asarray(z), zr, rtol=1e-4, atol=1e-5)


def test_k0_is_identity(rng):
    a_hat = normalized_adjacency(random_graph(1, 24, avg_degree=4))
    h = jnp.asarray(rng.normal(size=(24, 2)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(appnp_propagate(a_hat, h, k=0)), np.asarray(h)
    )


def test_forward_shape_and_jit_parity(rng):
    a_hat = normalized_adjacency(random_graph(2, 32, avg_degree=4))
    x = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    model = APPNP(hidden=(16,), num_classes=3, k=5)
    params = model.init(jax.random.PRNGKey(0), a_hat, x)
    out_e = model.apply(params, a_hat, x)
    out_j = jax.jit(model.apply)(params, a_hat, x)
    assert out_e.shape == (32, 3)
    np.testing.assert_allclose(
        np.asarray(out_j), np.asarray(out_e), rtol=1e-5, atol=1e-6
    )
    # rows are log-prob distributions
    np.testing.assert_allclose(
        np.exp(np.asarray(out_e)).sum(axis=1), np.ones(32), rtol=1e-5
    )


def test_learns_planted_partition():
    adj, labels = two_cluster_graph(3, nodes_per_cluster=32, p_in=0.3, p_out=0.02)
    a_hat = normalized_adjacency(adj)
    n = adj.shape[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
    y = jnp.asarray(labels.astype(np.int32))
    mask = jnp.ones((n,), jnp.float32)
    model = APPNP(hidden=(16,), num_classes=2, alpha=0.1, k=8)
    params = model.init(jax.random.PRNGKey(1), a_hat, x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    step = jax.jit(train_step(model, tx))
    first = None
    for _ in range(150):
        params, opt, loss = step(params, opt, a_hat, x, y, mask)
        first = first if first is not None else float(loss)
    assert float(loss) < 0.5 * first
    pred = np.asarray(model.apply(params, a_hat, x)).argmax(1)
    acc = (pred == labels).mean()
    assert acc > 0.9, acc
