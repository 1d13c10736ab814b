"""Serving-tier GPT decode: int8 weights + int8 KV cache, end-to-end.

The reference stops at fp32 encoder matmuls (README.md:61-80); this
module ties the framework's serving ladder — int8 Pallas GEMM
(kernels/gemm.py `gemm_int8_pallas`, 321.7 TOPS measured), int8 KV
(kernels/flash_attention.py `quantize_kv`), `QuantizedDense` — into one
deployable decode loop over the GPT family (models/gpt.py).

Why this shape: a single-token decode step at a few hundred M params is
WEIGHT-TRAFFIC-bound (every parameter streams through HBM once per
token) with the KV-cache read second; int8 weights halve the first,
int8 KV halves the second, and both halve the HBM footprint. Numerics
are the serving tier's (~1e-2 class — int8's information limit),
measured and reported by the benchmark, never silently substituted for
the float tiers.

Design notes (TPU/XLA):
  * The whole decode step stays one jitted program per (batch, cache
    length) — static cache buffers + `dynamic_update_slice`, exactly
    like the float path.
  * Weight matmuls run s8·s8→s32 on the MXU when the activation panel
    is wide enough to occupy it (batch ≥ 8 serving), and bf16 single
    pass otherwise — at batch 1 the MXU is idle either way and the win
    is pure weight traffic, so the int8 weights are streamed into a
    bf16 dot via an XLA convert fused into the dot operand.
  * KV cache: int8 buffers in the FLAT (b, L, h·d) layout (minor dim a
    whole number of 128-lane tiles — a d-minor int8 buffer relayouts
    wholesale on every decode append, measured 285 µs per tiny
    dynamic_update_slice on v5e; flat appends measure ~0) + per-(layer,
    batch, head) scales fixed at prefill time; decode-appended tokens
    are quantized into the SAME scale (clipped) so no cache-wide rescan
    happens per token. The attention dot streams the int8 cache and
    fuses the convert.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from tpusparse.models.gpt import GPTDecoder

__all__ = ["QuantizedGPT", "quantize_gpt"]


def _qrow(w):
    """Per-output-channel symmetric int8 of a DenseLinear kernel
    ((out, in) — layers.py:144 stores W for x·Wᵀ). Returns the int8
    weight TRANSPOSED to (in, out) (decode dots run x @ Wq directly,
    no per-call transpose) and the (out,) f32 scales."""
    amax = jnp.max(jnp.abs(w), axis=1)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / s[:, None]), -127, 127).astype(jnp.int8)
    return q.T, s.astype(jnp.float32)


@dataclass(eq=False)
class _QLinear:
    qw: jnp.ndarray  # (in, out) int8
    sw: jnp.ndarray  # (out,) f32
    b: jnp.ndarray   # (out,) f32

    def __call__(self, x):
        # batch-1 decode is weight-traffic-bound: stream int8, convert
        # fused into the bf16 dot. MEASURED (r5, v5e): this path IS at
        # the int8 byte bound — a stripped all-linears decode step runs
        # 0.527 ms/step vs the 0.492 ms int8 weight stream (368M params),
        # and the compiled scan carries no hoisted bf16 weight copy
        # (memory_analysis temps 64 MB). A Pallas int8-stream kernel tied
        # at ≤4 MB weights and LOST 1.5x at 50 MB (VPU convert serializes
        # against the MXU) — rejected. The step's remaining gap to the
        # weight bound is per-layer attention/bookkeeping math (~9.5 µs x
        # 24 layers, benchmarks/RESULTS.md r5), not weight traffic.
        y = jnp.dot(
            x.astype(jnp.bfloat16),
            self.qw.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return y * self.sw + self.b


@dataclass(eq=False)
class _QBlock:
    ln1: tuple  # (scale, bias)
    ln2: tuple
    q: _QLinear
    k: _QLinear
    v: _QLinear
    o: _QLinear
    fc1: _QLinear
    fc2: _QLinear
    # fused [q|k|v] projection (in, 3h): single-device decode streams ONE
    # weight instead of three 1 MB-class dots — per-dot fixed cost, not
    # convert traffic, is the batch-1 gap (r5 measured: XLA convert+dot
    # already hits the int8 byte bound per dot). None under tensor
    # parallelism (parallel/serving.shard_qgpt splits it back into
    # q/k/v, whose out features shard by head).
    qkv: "_QLinear | None" = None


def _ln(x, p, eps=1e-6):
    scale, bias = p
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


@dataclass(eq=False)
class QuantizedGPT:
    """int8-weight + int8-KV serving twin of a trained GPTDecoder.

    Built by `quantize_gpt(model, params)`; the float model/params are
    the training artifact, this is the deployment artifact (the analog
    of the reference's inspect-once/multiply-many lifecycle,
    custom_mm.cpp:283-357, applied to a whole model).

    `prefill(ids)` -> (logits, cache) with an int8 KV cache;
    `decode_step(tok, cache, pos)` -> (logits, cache). Both jittable;
    registered as a pytree so `jax.jit` can close over the instance.
    """

    blocks: Tuple[_QBlock, ...]
    tok_emb: jnp.ndarray   # (vocab, hidden) bf16
    pos_emb: jnp.ndarray   # (max_pos, hidden) bf16
    final_ln: tuple
    lm_head: _QLinear
    num_heads: int
    max_position: int

    @property
    def hidden(self) -> int:
        return self.tok_emb.shape[1]

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads

    def _split(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, self.head_dim).transpose(
            0, 2, 1, 3
        )

    def _merge(self, x):
        b, h, s, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    def _qkv(self, blk, h):
        """Per-head (q, k, v) from the fused projection when present
        (one weight stream), else the three separate linears (TP form)."""
        if blk.qkv is not None:
            h3 = blk.qkv(h)
            H = self.hidden
            return (
                self._split(h3[..., :H]),
                self._split(h3[..., H : 2 * H]),
                self._split(h3[..., 2 * H :]),
            )
        return tuple(self._split(f(h)) for f in (blk.q, blk.k, blk.v))

    def _embed(self, ids, pos0=0):
        pos = pos0 + jnp.arange(ids.shape[1])
        return (
            self.tok_emb[ids] + self.pos_emb[pos][None, :, :]
        ).astype(jnp.float32)

    # Cache layout is BATCH-ADAPTIVE (measured on the 368M config, v5e):
    # at batch 1 the per-step appends dominate — the head-major
    # (b, h, L, d) buffer has a 64-wide int8 minor dim (half a lane
    # tile) and relayouts wholesale on every tiny dynamic_update_slice
    # (int8 step 0.94 ms; the FLAT (b, L, h·d) layout's contiguous
    # 1024-wide appends take it to 0.74). At batch ≥ 8 the attention
    # READ dominates and the flat buffer's head-split view costs a
    # per-step relayout of the whole 200 MB cache instead (1.72 → 2.14
    # ms) — so small batches store flat, large ones head-major.
    _FLAT_BATCH_MAX = 2

    def _flat(self, kq):
        """(b, h, s, d) int8 -> (b, s, h·d) flat cache layout."""
        b, h, s, d = kq.shape
        return kq.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    def _heads(self, kqf):
        """(b, L, h·d) cache view -> (b, L, h, d) for the attention dots
        (read-side reshape; the buffer itself stays flat)."""
        b, L, _ = kqf.shape
        return kqf.reshape(b, L, self.num_heads, self.head_dim)

    def prefill(self, ids):
        """Prompt pass: float-math attention (prompt-length cost is a
        one-off), cache written int8 with per-(b, h) scales that decode
        appends reuse."""
        from tpusparse.kernels.flash_attention import quantize_kv

        b, s = ids.shape
        L = self.max_position
        x = self._embed(ids)
        cmask = jnp.tril(jnp.ones((s, s), bool))
        flat = b <= self._FLAT_BATCH_MAX
        cache = []
        for blk in self.blocks:
            h = _ln(x, blk.ln1)
            q, k, v = self._qkv(blk, h)
            kq, ks, vq, vs = quantize_kv(k, v)
            if flat:
                pad = ((0, 0), (0, L - s), (0, 0))
                cache.append(
                    (jnp.pad(self._flat(kq), pad), ks,
                     jnp.pad(self._flat(vq), pad), vs)
                )
            else:
                pad = ((0, 0), (0, 0), (0, L - s), (0, 0))
                cache.append(
                    (jnp.pad(kq, pad), ks, jnp.pad(vq, pad), vs)
                )
            sc = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / (self.head_dim ** 0.5)
            p = jax.nn.softmax(jnp.where(cmask, sc, -1e9), axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
            x = x + blk.o(self._merge(ctx))
            x = x + blk.fc2(jax.nn.gelu(blk.fc1(_ln(x, blk.ln2))))
        logits = self.lm_head(_ln(x, self.final_ln))
        return logits, tuple(cache)

    def decode_step(self, tok, cache, pos):
        """One token: int8 weight streams + int8 KV-cache attention.
        tok (b,) int32; pos traced scalar. Returns (logits (b, vocab),
        new cache)."""
        pos1 = jnp.asarray(pos, jnp.int32)[None]
        x = (
            self.tok_emb[tok[:, None]] + self.pos_emb[pos1][None, :, :]
        ).astype(jnp.float32)
        L = self.max_position
        new_cache = []
        for blk, (kq, ks, vq, vs) in zip(self.blocks, cache):
            h = _ln(x, blk.ln1)
            q, k, v = self._qkv(blk, h)
            flat = kq.ndim == 3
            # quantize the new token into the prefill scales (clipped:
            # the serving contract accepts the prefill range as the
            # cache's dynamic range); flat caches append ONE contiguous
            # 1024-wide row — see the layout note above
            kq1 = jnp.clip(
                jnp.round(k / ks[..., None, None]), -127, 127
            ).astype(jnp.int8)
            vq1 = jnp.clip(
                jnp.round(v / vs[..., None, None]), -127, 127
            ).astype(jnp.int8)
            if flat:
                kq = jax.lax.dynamic_update_slice(
                    kq, self._flat(kq1), (0, pos, 0)
                )
                vq = jax.lax.dynamic_update_slice(
                    vq, self._flat(vq1), (0, pos, 0)
                )
                kh, vh = self._heads(kq), self._heads(vq)
                k_spec, v_spec = "bkhd", "bkhd"
            else:
                kq = jax.lax.dynamic_update_slice(
                    kq, kq1, (0, 0, pos, 0)
                )
                vq = jax.lax.dynamic_update_slice(
                    vq, vq1, (0, 0, pos, 0)
                )
                kh, vh = kq, vq
                k_spec, v_spec = "bhkd", "bhkd"
            new_cache.append((kq, ks, vq, vs))
            # attention over the int8 cache: the convert fuses into the
            # dot operand, so the HBM stream is the int8 bytes; the BIG
            # cache operand stays in its stored order, only the tiny q/p
            # tensors adapt
            q2 = q.transpose(0, 2, 1, 3)  # (b, 1, h, d), tiny
            sc = jnp.einsum(
                f"bqhd,{k_spec}->bhqk",
                q2.astype(jnp.bfloat16),
                kh.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * (ks[:, :, None, None] / (self.head_dim ** 0.5))
            valid = jnp.arange(L)[None, None, None, :] <= pos
            p = jax.nn.softmax(jnp.where(valid, sc, -1e9), axis=-1)
            ctx = jnp.einsum(
                f"bhqk,{v_spec}->bqhd",
                p.astype(jnp.bfloat16),
                vh.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * vs[:, None, :, None]
            b_, q_, h_, d_ = ctx.shape
            x = x + blk.o(ctx.reshape(b_, q_, h_ * d_))
            x = x + blk.fc2(jax.nn.gelu(blk.fc1(_ln(x, blk.ln2))))
        logits = self.lm_head(_ln(x, self.final_ln))[:, 0, :]
        return logits, tuple(new_cache)

    def generate(self, prompt_ids, steps: int):
        """Greedy generation: prefill + one lax.scan of decode steps.

        prompt_len + steps must fit max_position: past it,
        dynamic_update_slice would CLAMP and silently overwrite the last
        cache slot (and pos_emb would clamp too) — corrupted tokens, no
        error — so the bound is checked here where it is static."""
        if prompt_ids.shape[1] + steps > self.max_position:
            raise ValueError(
                f"prompt ({prompt_ids.shape[1]}) + steps ({steps}) "
                f"exceeds max_position ({self.max_position})"
            )
        logits, cache = self.prefill(prompt_ids)
        first = jnp.argmax(logits[:, -1, :], axis=-1).astype(prompt_ids.dtype)
        p0 = prompt_ids.shape[1]

        def step(carry, i):
            tok, cache = carry
            lg, cache = self.decode_step(tok, cache, p0 + i)
            nxt = jnp.argmax(lg, axis=-1).astype(tok.dtype)
            return (nxt, cache), tok

        (_, _), toks = jax.lax.scan(step, (first, cache), jnp.arange(steps))
        return jnp.swapaxes(toks, 0, 1)


def _q_linear(p) -> _QLinear:
    qw, sw = _qrow(jnp.asarray(p["kernel"], jnp.float32))
    return _QLinear(qw=qw, sw=sw, b=jnp.asarray(p["bias"], jnp.float32))


def _ln_params(p):
    return (jnp.asarray(p["scale"]), jnp.asarray(p["bias"]))


def quantize_gpt(model: GPTDecoder, params) -> QuantizedGPT:
    """Quantize a trained GPTDecoder's parameters into a QuantizedGPT.

    Linear weights -> int8 per-output-channel; embeddings -> bf16 (a
    row gather, not a matmul); LayerNorms stay f32 (vector ops)."""
    p = params["params"]
    blocks = []
    for i in range(model.num_layers):
        bp = p[f"block{i}"]
        q, k, v = (
            _q_linear(bp[f"{nm}_proj"]) for nm in ("q", "k", "v")
        )
        # fused [q|k|v] stream for single-device decode; per-channel
        # scales concatenate exactly, so numerics are identical to the
        # separate projections. q/k/v stay None — parallel/serving's
        # shard_qgpt slices them back out of the fused weight when a
        # tensor-parallel mesh needs per-head column sharding.
        qkv = _QLinear(
            qw=jnp.concatenate([q.qw, k.qw, v.qw], axis=1),
            sw=jnp.concatenate([q.sw, k.sw, v.sw]),
            b=jnp.concatenate([q.b, k.b, v.b]),
        )
        blocks.append(
            _QBlock(
                ln1=_ln_params(bp["ln1"]),
                ln2=_ln_params(bp["ln2"]),
                q=None,
                k=None,
                v=None,
                o=_q_linear(bp["o_proj"]),
                fc1=_q_linear(bp["fc1"]),
                fc2=_q_linear(bp["fc2"]),
                qkv=qkv,
            )
        )
    return QuantizedGPT(
        blocks=tuple(blocks),
        tok_emb=jnp.asarray(p["tok_emb"]["embedding"], jnp.bfloat16),
        pos_emb=jnp.asarray(p["pos_emb"]["embedding"], jnp.bfloat16),
        final_ln=_ln_params(p["final_ln"]),
        lm_head=_q_linear(p["lm_head"]),
        num_heads=model.num_heads,
        max_position=model.max_position,
    )


# pytree registration: jitted callers close over / thread the instance
def _flatten_qlin(q):
    return (q.qw, q.sw, q.b), None


jax.tree_util.register_pytree_node(
    _QLinear, _flatten_qlin, lambda _, c: _QLinear(*c)
)


def _flatten_qblk(b):
    return (b.ln1, b.ln2, b.q, b.k, b.v, b.o, b.fc1, b.fc2, b.qkv), None


jax.tree_util.register_pytree_node(
    _QBlock, _flatten_qblk, lambda _, c: _QBlock(*c)
)


def _flatten_qgpt(m):
    children = (m.blocks, m.tok_emb, m.pos_emb, m.final_ln, m.lm_head)
    aux = (m.num_heads, m.max_position)
    return children, aux


def _unflatten_qgpt(aux, children):
    return QuantizedGPT(*children, num_heads=aux[0], max_position=aux[1])


jax.tree_util.register_pytree_node(
    QuantizedGPT, _flatten_qgpt, _unflatten_qgpt
)
