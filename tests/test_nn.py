"""Layer/model tests: forward parity, gradient flow, end-to-end training.

Goes beyond the reference's testing (which never gradient-checks its FC
layers and only observes them through a full MNIST epoch): layer-level
parity vs plain einsum, check_grads through SparseLinear, and a short
training run asserting the loss actually drops (BASELINE configs[2]).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from tpusparse.models import BertAttentionLayer, MnistNet, make_train_state, train_step
from tpusparse.models.mlp import nll_loss
from tpusparse.nn import DenseLinear, Pattern, SparseLinear
from tpusparse.utils.data import batches, synthetic_mnist


def test_dense_linear_parity(rng):
    layer = DenseLinear(features=12)
    x = jnp.asarray(rng.random((4, 20), dtype=np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    w = params["params"]["kernel"]
    b = params["params"]["bias"]
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x @ w.T + b), rtol=1e-5, atol=1e-5
    )
    # reference init bounds: U(±1/√fan_in)
    assert np.abs(np.asarray(w)).max() <= 1 / np.sqrt(20) + 1e-6


def test_dense_linear_batched_input(rng):
    layer = DenseLinear(features=8)
    x = jnp.asarray(rng.random((2, 3, 16), dtype=np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (2, 3, 8)


@pytest.mark.parametrize("method", ["tiled", "naive", "reference"])
def test_sparse_linear_parity(rng, method):
    pat = Pattern.random(1, (24, 40), 0.15)
    layer = SparseLinear(pattern=pat, method=method)
    x = jnp.asarray(rng.random((6, 40), dtype=np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    w = np.asarray(pat.to_csr(params["params"]["kernel_values"]).to_dense())
    b = np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ w.T + b, rtol=1e-5, atol=1e-5
    )


def test_sparse_linear_grads(rng):
    pat = Pattern.random(2, (16, 24), 0.2)
    layer = SparseLinear(pattern=pat)
    x = jnp.asarray(rng.random((4, 24), dtype=np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)

    def f(p, x):
        return layer.apply(p, x).sum()

    check_grads(f, (params, x), order=1, modes=["rev"], atol=5e-3, rtol=5e-3, eps=1e-3)


@pytest.mark.parametrize("variant", ["xla", "dense", "sparse"])
def test_mnist_training_loss_drops(variant):
    # End-to-end slice: fwd+bwd+SGD on the reference recipe (lr .01,
    # momentum .9, batch 32, NLL loss) — loss must drop.
    model = MnistNet(variant=variant)
    params, tx, opt_state = make_train_state(model, jax.random.PRNGKey(0))
    step = jax.jit(train_step(model, tx))
    tx_x, tx_y, _, _ = synthetic_mnist(n_train=512, n_test=64)
    losses = []
    for images, labels in batches(tx_x, tx_y, 32, seed=0):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images), jnp.asarray(labels)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_mnist_variants_agree_in_expectation():
    # dense vs xla variants share init scheme family; check logits shapes
    x = jnp.zeros((8, 784))
    for variant in ("xla", "dense", "sparse"):
        model = MnistNet(variant=variant)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (8, 10)
        # log_softmax rows sum to 1 in prob space
        np.testing.assert_allclose(
            np.exp(np.asarray(out)).sum(axis=1), 1.0, rtol=1e-5
        )


def test_nll_loss_matches_manual(rng):
    logp = jnp.log(jax.nn.softmax(jnp.asarray(rng.random((5, 10), dtype=np.float32))))
    labels = jnp.asarray([0, 3, 9, 2, 7])
    expected = -np.mean([np.asarray(logp)[i, l] for i, l in enumerate([0, 3, 9, 2, 7])])
    np.testing.assert_allclose(float(nll_loss(logp, labels)), expected, rtol=1e-6)


def test_bert_attention_layer(rng):
    # scaled-down geometry for interpreter-mode runtime
    layer = BertAttentionLayer(hidden=64, num_heads=4, intermediate=128)
    x = jnp.asarray(rng.random((2, 16, 64), dtype=np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (2, 16, 64)
    # gradient flows through the attention ops
    g = jax.grad(lambda p: layer.apply(p, x).sum())(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_attention_parity_vs_plain_jnp(rng):
    from tpusparse.nn.attention import SelfAttention

    attn = SelfAttention(num_heads=2, head_dim=8)
    x = jnp.asarray(rng.random((2, 8, 16), dtype=np.float32))
    params = attn.init(jax.random.PRNGKey(0), x)
    y = attn.apply(params, x)

    # re-compute with plain jnp from the same params
    p = params["params"]
    def lin(name, v):
        return v @ p[name]["kernel"].T + p[name]["bias"]
    q = lin("query", x).reshape(2, 8, 2, 8).transpose(0, 2, 1, 3)
    k = lin("key", x).reshape(2, 8, 2, 8).transpose(0, 2, 1, 3)
    v = lin("value", x).reshape(2, 8, 2, 8).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(2, 8, 16)
    expected = lin("out", ctx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=1e-4, atol=1e-4)


def test_train_epoch_scan_matches_stepwise(rng):
    """Device-side lax.scan epoch must produce the same params as the
    per-batch step loop."""
    import optax

    from tpusparse.models.mlp import (
        MnistNet,
        make_train_state,
        train_epoch,
        train_step,
    )

    model = MnistNet(variant="dense")
    params, tx, opt_state = make_train_state(
        model, jax.random.PRNGKey(0), input_shape=(4, 784)
    )
    x = jnp.asarray(rng.normal(size=(3, 4, 784)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(3, 4)).astype(np.int32))

    step = jax.jit(train_step(model, tx))
    p1, o1 = params, opt_state
    step_losses = []
    for i in range(3):
        p1, o1, l = step(p1, o1, x[i], y[i])
        step_losses.append(float(l))

    p2, o2, losses = jax.jit(train_epoch(model, tx))(params, opt_state, x, y)
    np.testing.assert_allclose(np.asarray(losses), step_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_block_sparse_linear_matches_sparse_linear(rng):
    from tpusparse.nn import BlockSparseLinear, Pattern, SparseLinear

    pat = Pattern.random(0, (24, 16), 0.3)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    bsl = BlockSparseLinear(pattern=pat, use_bias=False, blocksize=(8, 16))
    params = bsl.init(jax.random.PRNGKey(0), x)
    out = bsl.apply(params, x)
    # densify the packed kernel and compare against x @ Wᵀ
    from tpusparse.plan import build_plan

    plan = build_plan(pat.to_csr(np.zeros(pat.nnz, np.float32)), (8, 16))
    w_vals = plan.unpack_values(params["params"]["kernel_blocks"])
    w = np.asarray(pat.to_csr(w_vals).to_dense())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x) @ w.T, rtol=1e-4, atol=1e-5
    )

    # gradients stay inside the pattern: masked slots receive zero update
    def loss(p):
        return jnp.sum(bsl.apply(p, x) ** 2)

    g = jax.grad(loss)(params)["params"]["kernel_blocks"]
    mask = np.zeros((plan.num_slots * 8 * 16,), np.float32)
    mask[np.asarray(plan.scatter_idx)] = 1.0
    mask = mask.reshape(plan.num_slots, 8, 16)
    np.testing.assert_allclose(np.asarray(g) * (1 - mask), 0.0)


def test_mnist_blocksparse_variant_trains(rng):
    import optax

    from tpusparse.models.mlp import MnistNet, make_train_state, train_step

    model = MnistNet(variant="blocksparse", sparse_density=0.2)
    params, tx, opt_state = make_train_state(
        model, jax.random.PRNGKey(0), input_shape=(8, 784)
    )
    step = jax.jit(train_step(model, tx))
    x = jnp.asarray(rng.normal(size=(8, 784)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(8,)).astype(np.int32))
    first = None
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, x, y)
        first = first if first is not None else float(loss)
    assert float(loss) < first


def test_dense_linear_use_pallas_takes_effect(rng):
    """use_pallas must actually route through the Pallas GEMM (it was a
    declared-but-never-read field). Same math, same params."""
    from tpusparse.nn import DenseLinear

    x = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    plain = DenseLinear(64)
    pallas = DenseLinear(64, use_pallas=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(pallas.apply(params, x)),
        np.asarray(plain.apply(params, x)),
        rtol=1e-4, atol=1e-5,
    )
