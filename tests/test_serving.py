"""Serving-tier quantized GPT (models/serving.py).

Gates: the int8 decode path must track the float model within the
serving tier's honest error class (~1e-2 on logits — int8's information
limit), the KV-cache step must stay consistent with the quantized
prefill, and generation must run as one jitted program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.models import GPTDecoder, quantize_gpt


@pytest.fixture(scope="module")
def small():
    m = GPTDecoder(num_layers=2, hidden=64, num_heads=4, intermediate=128,
                   vocab_size=50, max_position=32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 50, (2, 8)).astype(np.int32)
    )
    params = m.init(jax.random.PRNGKey(0), ids)
    return m, params, ids, quantize_gpt(m, params)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)


def test_prefill_tracks_float_model(small):
    m, params, ids, qm = small
    lg_q, cache = qm.prefill(ids[:, :4])
    lg_f = m.apply(params, ids[:, :4])
    assert _rel(lg_q, lg_f) < 5e-2  # serving-tier class
    # cache buffers are int8 in the FLAT (b, L, h·d) layout (r5: d-minor
    # int8 buffers relayout on every decode append — serving.py _flat)
    # with per-(b, h) scales
    kq, ks, vq, vs = cache[0]
    assert kq.dtype == jnp.int8 and vq.dtype == jnp.int8
    assert kq.shape == (2, 32, 4 * 16) and ks.shape == (2, 4)


def test_decode_tracks_full_forward(small):
    """Step-by-step int8 decode vs the FLOAT full forward at each
    position — the KV-cache gate at serving fidelity."""
    m, params, ids, qm = small
    _, cache = qm.prefill(ids[:, :4])
    step = jax.jit(qm.decode_step)
    for t in range(4, 8):
        lg_q, cache = step(ids[:, t], cache, t)
        lg_f = m.apply(params, ids[:, : t + 1])[:, -1, :]
        assert _rel(lg_q, lg_f) < 8e-2, t


def test_decode_consistent_with_own_prefill(small):
    """Prefilling p tokens then decoding one must match prefilling p+1
    within the cache-clip error (same quantized weights both sides)."""
    _, _, ids, qm = small
    _, cache = qm.prefill(ids[:, :5])
    lg_step, _ = qm.decode_step(ids[:, 5], cache, 5)
    lg_full, _ = qm.prefill(ids[:, :6])
    assert _rel(lg_step, lg_full[:, -1, :]) < 3e-2


def test_generate_jits_and_is_deterministic(small):
    _, _, ids, qm = small
    gen = jax.jit(lambda p: qm.generate(p, 6))
    out1 = np.asarray(gen(ids[:, :4]))
    out2 = np.asarray(gen(ids[:, :4]))
    assert out1.shape == (2, 6)
    assert (out1 == out2).all()
    assert (out1 >= 0).all() and (out1 < 50).all()


def test_quantized_weights_are_int8(small):
    _, _, _, qm = small
    # r5: single-device blocks carry the FUSED [q|k|v] projection (one
    # weight stream per decode step); the TP path slices q/k/v back out
    blk = qm.blocks[0]
    assert blk.q is None and blk.k is None and blk.v is None
    assert blk.qkv.qw.dtype == jnp.int8
    assert blk.qkv.qw.shape == (64, 3 * 64)  # (in, 3·out)
    assert qm.lm_head.qw.shape == (64, 50)
    assert qm.tok_emb.dtype == jnp.bfloat16


def test_tp_decode_matches_single_device(small):
    """Megatron-sharded quantized decode on a 2x4 mesh reproduces the
    single-device decode logits (head-parallel attention + row-parallel
    reduces are a reformulation, not an approximation)."""
    from jax.sharding import Mesh

    from tpusparse.parallel import make_tp_decode_step, shard_qgpt

    _, _, ids, qm = small
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    _, cache = qm.prefill(ids[:, :4])
    ref, _ = qm.decode_step(ids[:, 4], cache, 4)

    qm_s, _ = shard_qgpt(qm, mesh)
    step = make_tp_decode_step(qm_s, mesh)
    lg, cache2 = step(ids[:, 4], cache, 4)
    # row-parallel partial sums reassociate the bf16 contractions, so
    # agreement is bf16-class relative to the logit scale, not bitwise
    scale = np.abs(np.asarray(ref)).max()
    assert _rel(lg, ref) < 5e-3, _rel(lg, ref)
    assert np.abs(np.asarray(lg) - np.asarray(ref)).max() / scale < 5e-3
    # head-sharded int8 cache round-trips through the step
    assert cache2[0][0].dtype == jnp.int8


def test_tp_decode_rejects_indivisible_heads(small):
    from jax.sharding import Mesh

    from tpusparse.parallel import shard_qgpt

    _, _, _, qm = small  # 4 heads
    devs = np.array(jax.devices()[:3]).reshape(1, 3)
    mesh = Mesh(devs, ("data", "model"))
    with pytest.raises(ValueError, match="must divide"):
        shard_qgpt(qm, mesh)
