"""GPT-style causal decoder + KV-cache decode loop (models/gpt.py).

No reference analog (the reference stops at encoder matmuls) — this is
the autoregressive serving surface: the classic correctness gate is
step-by-step decode logits matching the full causal forward at every
position.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpusparse.models import GPTDecoder, generate


@pytest.fixture(scope="module")
def small():
    m = GPTDecoder(num_layers=2, hidden=64, num_heads=4, intermediate=128,
                   vocab_size=50, max_position=32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 50, (2, 8)).astype(np.int32)
    )
    params = m.init(jax.random.PRNGKey(0), ids)
    return m, params, ids


def test_prefill_matches_full_forward(small):
    m, params, ids = small
    logits_p, cache = m.apply(params, ids[:, :4], method=GPTDecoder.prefill)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(m.apply(params, ids[:, :4])),
        rtol=2e-5, atol=2e-5,
    )
    ck, cv = cache
    assert len(ck) == 2 and ck[0].shape == (2, 4, 32, 16)


def test_decode_matches_full_forward_every_position(small):
    """THE KV-cache gate: decoding token-by-token against the cache must
    reproduce the full causal forward's last-position logits exactly."""
    m, params, ids = small
    _, cache = m.apply(params, ids[:, :4], method=GPTDecoder.prefill)
    for t in range(4, 8):
        lg, cache = m.apply(
            params, ids[:, t], cache, t, method=GPTDecoder.decode_step
        )
        ref = m.apply(params, ids[:, : t + 1])[:, -1, :]
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(ref), rtol=2e-4, atol=2e-5
        )


def test_generate_jits_and_is_deterministic(small):
    m, params, ids = small
    gen = jax.jit(
        lambda p, x: generate(m, p, x, steps=5)
    )
    out = np.asarray(gen(params, ids[:, :4]))
    assert out.shape == (2, 5) and out.dtype == np.int32
    assert (out == np.asarray(gen(params, ids[:, :4]))).all()
    assert (out >= 0).all() and (out < 50).all()


def test_fused_causal_matches_unfused(small):
    """fused=True routes the causal flash kernel; same params, same
    logits as the unfused score path."""
    _, params, _ = small
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 50, (1, 32)).astype(np.int32))
    kw = dict(num_layers=2, hidden=64, num_heads=4, intermediate=128,
              vocab_size=50, max_position=32)
    m_plain = GPTDecoder(**kw)
    m_fused = GPTDecoder(fused=True, **kw)
    ref = m_plain.apply(params, ids)
    out = m_fused.apply(params, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_trains_to_memorize(small):
    """Next-token loss on one fixed batch must drop under Adam — the
    whole stack (embeddings, blocks, head) is differentiable."""
    m, params, ids = small

    def loss_fn(p):
        logits = m.apply(p, ids[:, :-1])
        targets = ids[:, 1:]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, targets
        ).mean()

    tx = optax.adam(1e-2)
    opt = tx.init(params)
    l0 = float(loss_fn(params))

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    for _ in range(30):
        params, opt, l = step(params, opt)
    assert float(l) < 0.5 * l0, (l0, float(l))
