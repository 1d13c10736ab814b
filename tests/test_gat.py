"""GAT model family: layer forward vs a dense fp64 masked-attention
oracle, jit parity, gradient flow, and end-to-end learning on a planted
partition."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.models.gat import (
    GAT,
    GATLayer,
    add_self_loops,
    gat_layer_reference,
    make_train_state,
    train_step,
)
from tpusparse.models.gcn import random_graph, two_cluster_graph


def _dense64(a):
    return np.asarray(a.to_dense(), np.float64)


def test_gat_layer_matches_dense_oracle(rng):
    adj = add_self_loops(random_graph(0, 48, avg_degree=5))
    x = jnp.asarray(rng.random((48, 12), dtype=np.float32))
    layer = GATLayer(features=8, num_heads=3, concat=True)
    params = layer.init(jax.random.PRNGKey(0), adj, x)
    got = layer.apply(params, adj, x)
    ref = gat_layer_reference(
        _dense64(adj),
        params["params"],
        np.asarray(x),
        features=8,
        num_heads=3,
        concat=True,
    )
    assert got.shape == (48, 24)
    np.testing.assert_allclose(np.asarray(got, np.float64), ref, rtol=1e-4, atol=1e-4)


def test_gat_layer_mean_heads(rng):
    adj = add_self_loops(random_graph(1, 32, avg_degree=4))
    x = jnp.asarray(rng.random((32, 8), dtype=np.float32))
    layer = GATLayer(features=4, num_heads=2, concat=False)
    params = layer.init(jax.random.PRNGKey(1), adj, x)
    got = layer.apply(params, adj, x)
    ref = gat_layer_reference(
        _dense64(adj),
        params["params"],
        np.asarray(x),
        features=4,
        num_heads=2,
        concat=False,
    )
    assert got.shape == (32, 4)
    np.testing.assert_allclose(np.asarray(got, np.float64), ref, rtol=1e-4, atol=1e-4)


def test_gat_forward_under_jit(rng):
    adj = add_self_loops(random_graph(2, 40, avg_degree=5))
    x = jnp.asarray(rng.random((40, 8), dtype=np.float32))
    model = GAT(hidden=(8,), num_heads=2, num_classes=3)
    params = model.init(jax.random.PRNGKey(2), adj, x)
    eager = model.apply(params, adj, x)
    jitted = jax.jit(lambda p, xv: model.apply(p, adj, xv))(params, x)
    np.testing.assert_allclose(
        np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-6
    )
    # log-probabilities: rows normalize
    np.testing.assert_allclose(
        np.exp(np.asarray(eager, np.float64)).sum(-1), 1.0, rtol=1e-5
    )


def test_gat_grads_flow(rng):
    adj = add_self_loops(random_graph(3, 24, avg_degree=4))
    x = jnp.asarray(rng.random((24, 6), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 3, 24))
    model = GAT(hidden=(8,), num_heads=2, num_classes=3)
    params = model.init(jax.random.PRNGKey(3), adj, x)

    def loss(p):
        logp = model.apply(p, adj, x)
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # attention parameters receive gradient (not just the projections)
    att = grads["params"]["gat1"]["att_src"]
    assert float(jnp.abs(att).max()) > 0


def test_gat_learns_planted_partition():
    a, labels = two_cluster_graph(0, nodes_per_cluster=48)
    adj = add_self_loops(a)
    n = a.shape[0]
    x = jnp.eye(n, 16)
    y = jnp.asarray(labels)
    rng = np.random.default_rng(0)
    train_mask = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))
    model = GAT(hidden=(8,), num_heads=2, num_classes=2)
    params, tx, opt_state = make_train_state(
        model, jax.random.PRNGKey(4), adj, x, learning_rate=1e-2
    )
    step = jax.jit(train_step(model, tx))
    losses = []
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state, adj, x, y, train_mask)
        losses.append(float(loss))
    assert losses[-1] < 0.25 * losses[0], losses[::10]
    pred = np.asarray(model.apply(params, adj, x)).argmax(-1)
    test_mask = np.asarray(train_mask) == 0
    acc = (pred[test_mask] == labels[test_mask]).mean()
    assert acc > 0.9, acc
