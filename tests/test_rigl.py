"""Dynamic sparse training (RigL-style prune/regrow).

No reference analog (the reference only consumes fixed sparsity) —
validates the mask algebra (exact constant nnz), the drop/grow
selection semantics, the annealing schedule, and an end-to-end
sparse-to-sparse training run whose final mask harvests into the
framework's CSR executors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import tpusparse as ts
from tpusparse.nn import (
    apply_masks,
    cosine_drop_fraction,
    harvest_csr,
    init_masks,
    mask_grads,
    random_mask,
    rigl_update,
    rigl_update_tree,
    sparsity_of,
)


def test_random_mask_exact_nnz():
    for density in (0.05, 0.3, 0.9):
        m = random_mask(jax.random.PRNGKey(0), (37, 53), density)
        assert int(np.asarray(m).sum()) == round(density * 37 * 53)
        assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}


def test_rigl_update_preserves_nnz_and_selects_correctly():
    # hand-built case: 4 active of 8; drop_fraction 0.5 -> drop 2, grow 2
    mask = jnp.array([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    w = jnp.array([5.0, 0.1, 4.0, 0.2, 0, 0, 0, 0])
    g = jnp.array([0.0, 0, 0, 0, 9.0, 1.0, 8.0, 2.0])
    new = np.asarray(rigl_update(mask, w, g, 0.5))
    assert int(new.sum()) == 4
    # weakest actives (idx 1, 3) dropped; highest-grad inactives (4, 6) grown
    np.testing.assert_array_equal(new, [1, 0, 1, 0, 1, 0, 1, 0])


def test_rigl_update_nnz_constant_under_ties_and_extremes():
    rng = np.random.default_rng(0)
    mask = random_mask(jax.random.PRNGKey(1), (64, 64), 0.1)
    nnz = int(np.asarray(mask).sum())
    w = jnp.asarray(np.round(rng.normal(size=(64, 64)), 1).astype(np.float32))
    g = jnp.asarray(
        np.round(rng.normal(size=(64, 64)), 1).astype(np.float32)
    )  # heavy ties
    for df in (0.1, 0.3, 0.999):
        new = rigl_update(mask, w * mask, g, df)
        assert int(np.asarray(new).sum()) == nnz, df


def test_rigl_update_rejects_traced_mask():
    mask = random_mask(jax.random.PRNGKey(2), (8, 8), 0.5)
    with pytest.raises(ValueError, match="concrete mask"):
        jax.jit(lambda m: rigl_update(m, m, m, 0.3))(mask)


def test_cosine_schedule_endpoints():
    assert cosine_drop_fraction(0, 100, alpha=0.3) == pytest.approx(0.3)
    assert cosine_drop_fraction(100, 100, alpha=0.3) == pytest.approx(0.0)
    assert cosine_drop_fraction(200, 100, alpha=0.3) == pytest.approx(0.0)
    mid = cosine_drop_fraction(50, 100, alpha=0.3)
    assert 0.0 < mid < 0.3


def test_mask_tree_roundtrip_and_sparsity():
    params = {
        "dense": {"kernel": jnp.ones((16, 8)), "bias": jnp.ones((8,))},
        "head": {"kernel": jnp.ones((8, 4))},
    }
    masks = init_masks(params, 0.25, jax.random.PRNGKey(0))
    assert masks["dense"]["bias"] is None
    assert sparsity_of(masks) == pytest.approx(0.75, abs=0.02)
    masked = apply_masks(params, masks)
    np.testing.assert_array_equal(
        np.asarray(masked["dense"]["kernel"]),
        np.asarray(masks["dense"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(masked["dense"]["bias"]), np.ones((8,))
    )
    g = mask_grads(params, masks)
    np.testing.assert_array_equal(
        np.asarray(g["head"]["kernel"]), np.asarray(masks["head"]["kernel"])
    )


def test_harvest_csr_matches_masked_dense():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(24, 40)).astype(np.float32))
    mask = random_mask(jax.random.PRNGKey(4), (24, 40), 0.15)
    a = harvest_csr(w, mask)
    np.testing.assert_allclose(
        np.asarray(a.to_dense()), np.asarray(w * mask), rtol=1e-6
    )
    x = jnp.asarray(rng.normal(size=(40, 7)).astype(np.float32))
    y = ts.spmm(a, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(w * mask) @ np.asarray(x),
        rtol=1e-4, atol=1e-5,
    )


def test_end_to_end_sparse_training_loss_drops_and_topology_moves():
    """Tiny regression task: masked-dense training with periodic RigL
    updates keeps exact sparsity, moves the topology, and the final
    harvested CSR reproduces the trained predictor."""
    rng = np.random.default_rng(5)
    n_in, n_out, nb = 32, 16, 256
    # the TRUE weight is itself 30% dense, so a 0.3-density mask can
    # represent it exactly — RigL has to discover the support
    w_true = rng.normal(size=(n_in, n_out)).astype(np.float32)
    w_true *= rng.uniform(size=w_true.shape) < 0.3
    x = rng.normal(size=(nb, n_in)).astype(np.float32)
    y = x @ w_true
    params = {"kernel": jnp.asarray(rng.normal(size=(n_in, n_out)).astype(np.float32) * 0.1)}
    masks = init_masks(params, 0.3, jax.random.PRNGKey(6))
    nnz0 = int(np.asarray(masks["kernel"]).sum())
    # the RigL invariant: params STAY masked (inactive entries identically
    # zero), the forward uses the raw weight, so grads come out dense —
    # that dense gradient is the grow signal
    params = apply_masks(params, masks)
    tx = optax.adam(3e-2)
    opt = tx.init(params)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    @jax.jit
    def step(params, opt, masks):
        def loss_fn(p):
            pred = xj @ p["kernel"]
            return jnp.mean((pred - yj) ** 2)

        loss, dense_grads = jax.value_and_grad(loss_fn)(params)
        upd, opt2 = tx.update(mask_grads(dense_grads, masks), opt, params)
        params2 = apply_masks(optax.apply_updates(params, upd), masks)
        return params2, opt2, loss, dense_grads

    losses = []
    mask0 = np.asarray(masks["kernel"]).copy()
    for t in range(300):
        params, opt, loss, dg = step(params, opt, masks)
        losses.append(float(loss))
        if t % 50 == 49:
            df = cosine_drop_fraction(t, 300, alpha=0.3)
            masks = rigl_update_tree(masks, params, dg, df)
            assert int(np.asarray(masks["kernel"]).sum()) == nnz0
            params = apply_masks(params, masks)
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
    moved = (np.asarray(masks["kernel"]) != mask0).sum()
    assert moved > 0  # topology actually explored
    # the learned topology should overlap the true support far beyond
    # the random-chance rate (~30%)
    true_support = (w_true != 0).astype(np.float32)
    overlap = (np.asarray(masks["kernel"]) * true_support).sum() / nnz0
    assert overlap > 0.45, overlap
    # harvest and check sparse-executor parity with the masked dense model
    a = harvest_csr(
        jnp.asarray(np.asarray(params["kernel"]).T),
        jnp.asarray(np.asarray(masks["kernel"]).T),
    )
    pred_sparse = np.asarray(ts.spmm(a, xj.T)).T
    pred_dense = np.asarray(xj @ (params["kernel"] * masks["kernel"]))
    np.testing.assert_allclose(pred_sparse, pred_dense, rtol=1e-4, atol=1e-5)


def test_rigl_ties_never_prune_strictly_stronger_weights():
    # ties at the keep-threshold appear BEFORE a strictly larger weight:
    # a positional trim would prune the 9 while keeping two tied 5s
    mask = jnp.array([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    w = jnp.array([5.0, 5.0, 5.0, 9.0, 0, 0, 0, 0])
    g = jnp.array([0.0, 0, 0, 0, 1.0, 1.0, 1.0, 2.0])
    new = np.asarray(rigl_update(mask, w, g, 0.5))
    assert int(new.sum()) == 4
    assert new[3] == 1  # the strictly-strongest weight survives
    assert new[7] == 1  # the strictly-highest gradient is grown
    assert new[:3].sum() == 1  # exactly one of the tied 5s kept
