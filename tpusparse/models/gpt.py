"""GPT-style causal decoder with a TPU-native KV-cache decode loop.

The reference stops at encoder-shaped matmul workloads (BERT attention,
README.md:61-80); a serving-oriented framework also needs the
autoregressive side: causal training/prefill plus an O(1)-per-token
decode step over a static-shape KV cache (XLA requires static shapes —
the cache is a fixed (b, h, max_len, d) buffer written with
`dynamic_update_slice`, and generation is one `lax.scan`, so the whole
decode loop is a single compiled program).

Training/prefill attention rides the framework's kernels: the fused
causal flash kernel past the ~2k-seq crossover (`fused=True`), XLA
dense below it. The int8-KV serving tier plugs in at the cache level:
`quantize_kv` on a prefilled cache + `flash_attention_q8` scores long
contexts at half the KV traffic (kernels/flash_attention.py).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpusparse.nn.layers import DenseLinear


class GPTBlock(nn.Module):
    """Pre-LN decoder block: causal MHSA + MLP, residual both."""

    hidden: int
    num_heads: int
    intermediate: int
    fused: bool = False

    def setup(self):
        self.ln1 = nn.LayerNorm()
        self.q_proj = DenseLinear(self.hidden)
        self.k_proj = DenseLinear(self.hidden)
        self.v_proj = DenseLinear(self.hidden)
        self.o_proj = DenseLinear(self.hidden)
        self.ln2 = nn.LayerNorm()
        self.fc1 = DenseLinear(self.intermediate)
        self.fc2 = DenseLinear(self.hidden)

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads

    def _split(self, x):  # (b, s, hidden) -> (b, heads, s, head_dim)
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, self.head_dim).transpose(
            0, 2, 1, 3
        )

    def _merge(self, x):  # (b, heads, s, head_dim) -> (b, s, hidden)
        b, h, s, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    def _kv(self, x):
        h = self.ln1(x)
        return (
            self._split(self.q_proj(h)),
            self._split(self.k_proj(h)),
            self._split(self.v_proj(h)),
        )

    def _mlp(self, x):
        return x + self.fc2(nn.gelu(self.fc1(self.ln2(x))))

    def __call__(self, x):
        """Full-sequence causal pass (training / scoring)."""
        q, k, v = self._kv(x)
        if self.fused:
            from tpusparse.kernels.flash_attention import flash_attention_diff

            ctx = flash_attention_diff(q, k, v, True, None)
        else:
            s = x.shape[1]
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (self.head_dim ** 0.5)
            cmask = jnp.tril(jnp.ones((s, s), bool))
            probs = jax.nn.softmax(jnp.where(cmask, scores, -1e9), axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        x = x + self.o_proj(self._merge(ctx))
        return self._mlp(x)

    def prefill(self, x):
        """Like __call__, but also returns this block's full K/V (for
        seeding a decode cache)."""
        q, k, v = self._kv(x)
        s = x.shape[1]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (self.head_dim ** 0.5)
        cmask = jnp.tril(jnp.ones((s, s), bool))
        probs = jax.nn.softmax(jnp.where(cmask, scores, -1e9), axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        x = x + self.o_proj(self._merge(ctx))
        return self._mlp(x), k, v

    def decode(self, x1, cache_k, cache_v, pos):
        """One-token step. x1 (b, 1, hidden); cache_k/v (b, h, L, d);
        pos: traced scalar — the slot this token occupies. Returns
        (out (b, 1, hidden), new_cache_k, new_cache_v)."""
        q, k, v = self._kv(x1)  # (b, h, 1, d) each
        cache_k = jax.lax.dynamic_update_slice(cache_k, k, (0, 0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v, (0, 0, pos, 0))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, cache_k) / (
            self.head_dim ** 0.5
        )
        L = cache_k.shape[2]
        valid = jnp.arange(L)[None, None, None, :] <= pos
        probs = jax.nn.softmax(jnp.where(valid, scores, -1e9), axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, cache_v)
        x1 = x1 + self.o_proj(self._merge(ctx))
        return self._mlp(x1), cache_k, cache_v


class GPTDecoder(nn.Module):
    """Causal LM: embeddings + N GPTBlocks + LN + LM head.

    Three entry points (all sharing one parameter tree):
      * `__call__(ids)` — full causal logits (training/scoring);
      * `prefill(ids)` — logits AND a KV cache seeded with the prompt
        (cache buffers are max_position long, XLA-static);
      * `decode_step(tok, cache, pos)` — one-token step against the
        cache; drive it with `generate` (a lax.scan) for autoregression.
    """

    num_layers: int = 4
    hidden: int = 256
    num_heads: int = 4
    intermediate: int = 1024
    vocab_size: int = 1000
    max_position: int = 512
    fused: bool = False

    def setup(self):
        self.tok_emb = nn.Embed(self.vocab_size, self.hidden)
        self.pos_emb = nn.Embed(self.max_position, self.hidden)
        self.blocks = [
            GPTBlock(
                hidden=self.hidden,
                num_heads=self.num_heads,
                intermediate=self.intermediate,
                fused=self.fused,
                name=f"block{i}",
            )
            for i in range(self.num_layers)
        ]
        self.final_ln = nn.LayerNorm()
        self.lm_head = DenseLinear(self.vocab_size)

    def _embed(self, ids, pos0=0):
        b, s = ids.shape
        pos = pos0 + jnp.arange(s)
        return self.tok_emb(ids) + self.pos_emb(pos)[None, :, :]

    def __call__(self, ids):
        x = self._embed(ids)
        for blk in self.blocks:
            x = blk(x)
        return self.lm_head(self.final_ln(x))

    def prefill(self, ids):
        """(logits (b, s, vocab), cache) with cache seeded by the prompt."""
        b, s = ids.shape
        x = self._embed(ids)
        ck: List[jnp.ndarray] = []
        cv: List[jnp.ndarray] = []
        d = self.hidden // self.num_heads
        for blk in self.blocks:
            x, k, v = blk.prefill(x)
            pad = (
                (0, 0), (0, 0), (0, self.max_position - s), (0, 0)
            )
            ck.append(jnp.pad(k, pad))
            cv.append(jnp.pad(v, pad))
        logits = self.lm_head(self.final_ln(x))
        return logits, (tuple(ck), tuple(cv))

    def decode_step(self, tok, cache, pos):
        """tok (b,) int32, cache from prefill/decode, pos traced scalar
        (the position of `tok`). Returns (logits (b, vocab), new_cache)."""
        pos1 = jnp.asarray(pos, jnp.int32)[None]
        x = self.tok_emb(tok[:, None]) + self.pos_emb(pos1)[None, :, :]
        ck, cv = cache
        nk, nv = [], []
        for blk, k, v in zip(self.blocks, ck, cv):
            x, k2, v2 = blk.decode(x, k, v, pos)
            nk.append(k2)
            nv.append(v2)
        logits = self.lm_head(self.final_ln(x))[:, 0, :]
        return logits, (tuple(nk), tuple(nv))


def generate(
    model: GPTDecoder,
    params,
    prompt_ids: jnp.ndarray,
    steps: int,
) -> jnp.ndarray:
    """Greedy autoregressive generation: prefill once, then one lax.scan
    of decode steps (static shapes, one compiled program). Returns
    (b, steps) generated token ids. prompt_len + steps must fit
    max_position (past it, the cache update and pos_emb gather would
    CLAMP and silently corrupt the last slot)."""
    if prompt_ids.shape[1] + steps > model.max_position:
        raise ValueError(
            f"prompt ({prompt_ids.shape[1]}) + steps ({steps}) exceeds "
            f"max_position ({model.max_position})"
        )
    logits, cache = model.apply(params, prompt_ids, method=GPTDecoder.prefill)
    first = jnp.argmax(logits[:, -1, :], axis=-1).astype(prompt_ids.dtype)
    p0 = prompt_ids.shape[1]

    def step(carry, i):
        tok, cache = carry
        logits, cache = model.apply(
            params, tok, cache, p0 + i, method=GPTDecoder.decode_step
        )
        nxt = jnp.argmax(logits, axis=-1).astype(tok.dtype)
        return (nxt, cache), tok

    (_, _), toks = jax.lax.scan(
        step, (first, cache), jnp.arange(steps)
    )
    return jnp.swapaxes(toks, 0, 1)  # (b, steps)
