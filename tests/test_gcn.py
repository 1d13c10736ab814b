"""GCN model family: normalization algebra, forward parity vs a dense
fp64 oracle, gradient flow, and end-to-end learning on a planted
partition (the model must recover the clusters from structure alone)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.models.gcn import (
    GCN,
    gcn_reference,
    make_train_state,
    normalized_adjacency,
    random_graph,
    train_step,
    two_cluster_graph,
)


def _dense64(a):
    return np.asarray(a.to_dense(), np.float64)


def test_normalized_adjacency_algebra():
    adj = random_graph(0, 48, avg_degree=6)
    a_hat = normalized_adjacency(adj)
    d = _dense64(adj) + np.eye(48)
    deg = d.sum(1)
    ref = d / np.sqrt(np.outer(deg, deg))
    np.testing.assert_allclose(_dense64(a_hat), ref, rtol=1e-5, atol=1e-6)
    # rows of Â sum to <= 1 and the operator is symmetric
    np.testing.assert_allclose(_dense64(a_hat), _dense64(a_hat).T, atol=1e-7)


def test_normalized_adjacency_isolated_nodes():
    from tpusparse.types import CSR

    dense = np.zeros((4, 4), np.float32)
    dense[0, 1] = dense[1, 0] = 1.0
    a_hat = normalized_adjacency(CSR.from_dense(jnp.asarray(dense)))
    out = _dense64(a_hat)
    assert np.isfinite(out).all()
    # isolated nodes keep exactly their self-loop (normalized to 1)
    np.testing.assert_allclose(out[2, 2], 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[3, 3], 1.0, rtol=1e-6)


def test_gcn_forward_matches_dense_oracle(rng):
    adj = random_graph(1, 64, avg_degree=6)
    a_hat = normalized_adjacency(adj)
    x = jnp.asarray(rng.random((64, 16), dtype=np.float32))
    model = GCN(hidden=(32,), num_classes=4)
    params = model.init(jax.random.PRNGKey(0), a_hat, x)
    got = model.apply(params, a_hat, x)
    ref = gcn_reference(_dense64(a_hat), params, np.asarray(x))
    np.testing.assert_allclose(np.asarray(got, np.float64), ref, rtol=1e-4, atol=1e-4)


def test_gcn_forward_under_jit(rng):
    adj = random_graph(2, 48, avg_degree=5)
    a_hat = normalized_adjacency(adj)
    x = jnp.asarray(rng.random((48, 8), dtype=np.float32))
    model = GCN(hidden=(16,), num_classes=3)
    params = model.init(jax.random.PRNGKey(1), a_hat, x)
    eager = model.apply(params, a_hat, x)
    jitted = jax.jit(lambda p, xv: model.apply(p, a_hat, xv))(params, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-6)


def test_gcn_grads_flow(rng):
    adj = random_graph(3, 32, avg_degree=4)
    a_hat = normalized_adjacency(adj)
    x = jnp.asarray(rng.random((32, 8), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 3, 32))
    model = GCN(hidden=(16,), num_classes=3)
    params = model.init(jax.random.PRNGKey(2), a_hat, x)

    def loss(p):
        logp = model.apply(p, a_hat, x)
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_gcn_learns_planted_partition():
    a, labels = two_cluster_graph(0, nodes_per_cluster=48)
    a_hat = normalized_adjacency(a)
    n = a.shape[0]
    x = jnp.eye(n, 16)  # weak features: structure must do the work
    y = jnp.asarray(labels)
    rng = np.random.default_rng(0)
    train_mask = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))
    model = GCN(hidden=(16,), num_classes=2)
    params, tx, opt_state = make_train_state(model, jax.random.PRNGKey(3), a_hat, x)
    step = jax.jit(train_step(model, tx))
    losses = []
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state, a_hat, x, y, train_mask)
        losses.append(float(loss))
    assert losses[-1] < 0.25 * losses[0], losses[::10]
    pred = np.asarray(model.apply(params, a_hat, x)).argmax(-1)
    test_mask = np.asarray(train_mask) == 0
    acc = (pred[test_mask] == labels[test_mask]).mean()
    assert acc > 0.9, acc
