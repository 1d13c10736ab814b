"""Multi-head self-attention on the framework's batched matmul ops.

Covers the reference's BERT integration recipe (README.md:61-80): the
attention-score product torch.matmul(Q, Kᵀ) is replaced by the
transposed-B batched matmul op (`cublasTransbMM.apply(Q, K)` there,
`ops.transb_mm` here), and the context product by the plain batched op.

Also provides a block-sparse attention-score variant: a static sparsity
pattern over (seq, seq) scores routed through the tiled SpMM — a
capability the reference gestures at (sparse kernels "incorporated into
BERT") but never ships.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpusparse import ops
from tpusparse.nn.layers import DenseLinear


def local_global_pattern(
    seq: int, window: int, num_global: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Static (seq, seq) attention pattern: local band + global tokens.

    Row i may attend to keys j with |i-j| <= window, to the first
    `num_global` keys, and rows < num_global attend everywhere (the
    standard local+global sparse-attention shape). Returns CSR
    (indices, indptr) as host numpy — a trace-time constant.
    """
    i = np.arange(seq)[:, None]
    j = np.arange(seq)[None, :]
    allowed = np.abs(i - j) <= window
    if num_global:
        allowed |= j < num_global
        allowed |= i < num_global
    indptr = np.zeros(seq + 1, dtype=np.int32)
    np.cumsum(allowed.sum(axis=1), out=indptr[1:])
    indices = np.nonzero(allowed)[1].astype(np.int32)
    return indices, indptr


def bigbird_pattern(
    seq: int,
    block: int = 64,
    window_blocks: int = 3,
    num_global_blocks: int = 1,
    num_random_blocks: int = 2,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """BigBird-style BLOCK attention pattern: sliding window + global +
    random blocks (Zaheer et al.'s three components, re-derived at block
    granularity so every allowed region is an MXU-friendly dense tile).

    The (seq/block)² block grid admits: the `window_blocks`-wide block
    diagonal, the first `num_global_blocks` block rows AND columns
    (bidirectional global tokens), and `num_random_blocks` uniformly
    sampled extra blocks per block row (deterministic in `seed` — the
    pattern is a trace-time constant, so the SAME random blocks are used
    for the whole training run, which is what makes plans cacheable).
    Returns CSR (indices, indptr) over TOKENS, like
    `local_global_pattern`, ready for `SparseSelfAttention`'s kernels.
    """
    if seq % block:
        raise ValueError(f"seq {seq} must be a multiple of block {block}")
    nb = seq // block
    bi = np.arange(nb)[:, None]
    bj = np.arange(nb)[None, :]
    half = window_blocks // 2
    allowed = np.abs(bi - bj) <= half
    if num_global_blocks:
        allowed |= bj < num_global_blocks
        allowed |= bi < num_global_blocks
    if num_random_blocks and nb > window_blocks + num_global_blocks:
        rng = np.random.default_rng(seed)
        for r in range(nb):
            cand = np.flatnonzero(~allowed[r])
            if cand.size:
                pick = rng.choice(
                    cand, size=min(num_random_blocks, cand.size), replace=False
                )
                allowed[r, pick] = True
    # expand block grid to token CSR
    tok = np.kron(allowed, np.ones((block, block), bool))
    indptr = np.zeros(seq + 1, dtype=np.int32)
    np.cumsum(tok.sum(axis=1), out=indptr[1:])
    indices = np.nonzero(tok)[1].astype(np.int32)
    return indices, indptr


_BLOCKFLASH_TILE_S = 1.2e-6  # s/head per 256² occupied tile (v5e, measured
#                              0.206 ms / (14 tiles x 12 heads) this round)
_SDDMM_PER_NNZ_S = 45e-9     # 3 gather-grain passes x ~15 ns/nnz floor
_DENSE_PER_SCORE_S = 8.2e-12  # s/head per score element: 4d/170TF MXU +
#                               ~4 B/elem of fused-softmax HBM traffic
#                               (measured 5.75 µs/head at seq 1024, d 64 —
#                               the model over-estimates ~1.4x, biasing
#                               toward the sparse engines at the margin)


def route_sparse_attention(
    indices, indptr, seq: int, block: int = 0, head_dim: int = 64
) -> Tuple[str, Optional[object], str]:
    """Pick the engine for an arbitrary token-level attention pattern.

    Three candidates, costed per head from measured v5e constants:
      * 'blockflash' — the pattern block-ified onto a (block, block)
        grid (block=0 auto-picks), token-exact via per-tile masks; costs
        ~1.2 µs per occupied tile (the kernel is tile-launch-bound at
        these sizes).
      * 'dense' — masked dense attention; XLA's fused softmax makes this
        unbeatable below the ~2k-seq crossover (same finding as flash vs
        unfused, RESULTS.md r2) whenever the blocked pattern covers a
        large fraction of the grid.
      * 'sddmm' — per-nonzero gather grain; only wins for patterns so
        scattered that occupied blocks average <~25 nonzeros.
    Returns (method, plan-or-None, report); unit-tested directly, used
    by SparseSelfAttention(method='auto').
    """
    nnz = int(np.asarray(indptr)[-1])
    t_dn = seq * seq * _DENSE_PER_SCORE_S
    t_sd = nnz * _SDDMM_PER_NNZ_S
    if block <= 0:
        block = 256 if seq % 256 == 0 and seq >= 1024 else (
            128 if seq % 128 == 0 else 64
        )
    if seq % block:
        method = "dense" if t_dn < t_sd else "sddmm"
        return method, None, (
            f"{method}: seq {seq} not tileable by any MXU block size "
            f"(dense ~{t_dn*1e3:.3f} ms/head vs sddmm ~{t_sd*1e3:.2f})"
        )
    plan = _block_attn_plan_from_tokens(
        _np_bytes(indices), _np_bytes(indptr), seq, block
    )
    tiles = int(plan.kv_cnt.sum())
    t_bf = tiles * _BLOCKFLASH_TILE_S * max((block / 256.0) ** 2, 0.35)
    report = (
        f"pattern nnz={nnz}, block {block}: {tiles} occupied tiles "
        f"(block density {plan.density:.3f}, padding x{plan.padding_ratio:.1f}"
        f"{', token-exact masks' if plan.tile_masks is not None else ', pure block'}) "
        f"-> blockflash ~{t_bf*1e3:.3f} vs dense ~{t_dn*1e3:.3f} vs "
        f"sddmm ~{t_sd*1e3:.2f} ms/head"
    )
    best = min(("blockflash", t_bf), ("dense", t_dn), ("sddmm", t_sd),
               key=lambda kv: kv[1])[0]
    # the plan is returned whenever block-ification is POSSIBLE (so a
    # forced method='blockflash' can use it even when dense projects
    # faster); it is None only for untileable seqs
    return best, plan, report + f" -> {best}"


def _np_bytes(x) -> bytes:
    return np.ascontiguousarray(np.asarray(x, np.int32)).tobytes()


@functools.lru_cache(maxsize=32)
def _block_attn_plan_from_tokens(ind_b: bytes, ptr_b: bytes, seq: int, block: int):
    from tpusparse.kernels.flash_attention import BlockAttnPlan

    indices = np.frombuffer(ind_b, np.int32)
    indptr = np.frombuffer(ptr_b, np.int32)
    return BlockAttnPlan.from_token_pattern(indices, indptr, seq, block, block)


class SparseSelfAttention(nn.Module):
    """Multi-head self-attention with sparse attention scores.

    The capability the reference's README gestures at (sparse kernels
    "incorporated into BERT", README.md:61-80) but never ships: the
    (seq, seq) score matrix is never materialized.

    Engines (`method`): 'auto' (default) routes through
    `route_sparse_attention` over three costed candidates — the fused
    block-flash kernel with token-exact per-tile masks (MXU-grain
    compute, O(occupied blocks) traffic; measured 110x over the old
    SDDMM default at seq 1024), masked DENSE attention (XLA's fused
    softmax is unbeatable below the ~2k-seq crossover when the blocked
    pattern covers most of the grid), and the SDDMM gather path (only
    for patterns too scattered for tile launches to pay).
    'blockflash'/'dense'/'sddmm' force an engine. The SDDMM path:
    scores = SDDMM(pattern, Q, Kᵀ) produces only the allowed entries, a
    segment softmax normalizes each row over its nonzeros, and
    context = SpMM(probs, V) on the gather path; all three stages carry
    their own VJPs. Every engine trains end-to-end and matches the
    masked dense softmax oracle on the exact token pattern.
    """

    num_heads: int
    head_dim: int
    window: int = 64
    num_global: int = 0
    # optional seq -> (indices, indptr) override; e.g.
    # partial(bigbird_pattern, block=64). A callable (hashable) rather
    # than raw arrays so the module stays a well-behaved frozen dataclass.
    pattern_fn: Optional[Callable] = None
    method: str = "auto"
    block: int = 0  # blockflash tile size; 0 = auto-pick from seq

    @nn.compact
    def __call__(self, hidden):
        from tpusparse.types import CSR

        if self.method not in ("auto", "blockflash", "dense", "sddmm"):
            raise ValueError(
                f"unknown method {self.method!r} "
                "(auto/blockflash/dense/sddmm)"
            )
        b, s, h = hidden.shape
        d = self.num_heads * self.head_dim
        q = DenseLinear(d, name="query")(hidden)
        k = DenseLinear(d, name="key")(hidden)
        v = DenseLinear(d, name="value")(hidden)

        def split(x):
            return x.reshape(b, s, self.num_heads, self.head_dim).transpose(
                0, 2, 1, 3
            ).reshape(b * self.num_heads, s, self.head_dim)

        q, k, v = split(q), split(k), split(v)
        if self.pattern_fn is not None:
            indices, indptr = self.pattern_fn(s)
        else:
            indices, indptr = local_global_pattern(
                s, self.window, self.num_global
            )

        method, plan = self.method, None
        if method in ("auto", "blockflash"):
            routed, plan, _report = route_sparse_attention(
                indices, indptr, s, self.block, self.head_dim
            )
            if method == "auto":
                method = routed
            elif plan is None:  # forced blockflash on an untileable seq
                raise ValueError(_report)

        if method == "blockflash":
            from tpusparse.kernels.flash_attention import (
                block_flash_attention_diff,
            )

            ctx = block_flash_attention_diff(q, k, v, plan)
        elif method == "dense":
            mask = np.zeros((s, s), bool)
            mask[
                np.repeat(np.arange(s), np.diff(indptr)), np.asarray(indices)
            ] = True
            scores = ops.transb_mm(q, k) / np.sqrt(self.head_dim)
            scores = jnp.where(jnp.asarray(mask), scores, -1e9)
            ctx = ops.mm(jax.nn.softmax(scores, axis=-1), v)
        else:
            ctx = self._sddmm_attention(q, k, v, s, indices, indptr)
        ctx = ctx.reshape(b, self.num_heads, s, self.head_dim)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
        return DenseLinear(h, name="out")(ctx)

    def _sddmm_attention(self, q, k, v, s, indices, indptr):
        from tpusparse.types import CSR

        rows = np.repeat(np.arange(s, dtype=np.int32), np.diff(indptr))
        scale = 1.0 / np.sqrt(self.head_dim)

        def one_head(qh, kh, vh):
            vals = ops.sddmm(
                CSR(jnp.zeros(len(indices), qh.dtype), indices, indptr, (s, s)),
                qh,
                jnp.swapaxes(kh, 0, 1),
            ) * scale
            # segment softmax over each row's nonzeros
            mx = jax.ops.segment_max(vals, rows, num_segments=s)
            e = jnp.exp(vals - mx[rows])
            z = jax.ops.segment_sum(e, rows, num_segments=s)
            probs = e / z[rows]
            return ops.gather_spmm(CSR(probs, indices, indptr, (s, s)), vh)

        return jax.vmap(one_head)(q, k, v)  # (b*heads, s, head_dim)


def banded_blocks(q, k_pad, v_pad, window: int, block0_pos, s_total: int):
    """Blockwise band attention given padded K/V (nbl+2 blocks).

    q: (b, h, nbl, B, hd); k_pad/v_pad: (b, h, nbl+2, B, hd) where
    block 0 is the left halo and block nbl+1 the right halo.
    block0_pos: global block index of q's first block (may be traced —
    the sequence-parallel ring passes its shard base; LocalAttention
    passes 0 with zero halos). SINGLE implementation shared by the
    unsharded layer and parallel.ring_local_attention so the two paths
    cannot drift numerically.
    """
    B = window
    nbl = q.shape[2]
    k_ext = jnp.concatenate(
        [k_pad[:, :, :-2], k_pad[:, :, 1:-1], k_pad[:, :, 2:]], axis=3
    )
    v_ext = jnp.concatenate(
        [v_pad[:, :, :-2], v_pad[:, :, 1:-1], v_pad[:, :, 2:]], axis=3
    )
    from tpusparse.dense import einsum as precise_einsum

    scores = precise_einsum("bhnqd,bhnkd->bhnqk", q, k_ext) / np.sqrt(
        q.shape[-1]
    )
    qi = np.arange(B)[:, None]
    kj = np.arange(3 * B)[None, :]
    band = jnp.asarray(np.abs(qi - kj + B) <= B)  # (B, 3B), block-independent
    n_idx = block0_pos + jnp.arange(nbl)[:, None, None]
    key_pos = (n_idx - 1) * B + kj[None]
    in_range = (key_pos >= 0) & (key_pos < s_total)
    mask = band[None] & in_range
    scores = jnp.where(mask[None, None], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    return precise_einsum("bhnqk,bhnkd->bhnqd", probs, v_ext)



class LocalAttention(nn.Module):
    """Banded (sliding-window) attention computed blockwise on the MXU.

    The SDDMM path (SparseSelfAttention) is the general-pattern engine;
    for the banded pattern |i-j| <= window — the dominant sparse-attention
    shape — per-nonzero gathers are the wrong grain for TPU. Here queries
    are split into window-sized blocks and each block attends densely to
    its own and both neighbor key blocks (3·window keys), masked back to
    the exact band: compute scales as seq·3·window·d instead of seq²·d
    and every product is an MXU-shaped dense matmul. Numerically
    identical to dense attention masked to the band.
    """

    num_heads: int
    head_dim: int
    window: int = 128

    @nn.compact
    def __call__(self, hidden):
        b, s, h = hidden.shape
        d = self.num_heads * self.head_dim
        B = self.window
        if s % B != 0:
            raise ValueError(f"seq {s} must be a multiple of window {B}")
        nb = s // B
        q = DenseLinear(d, name="query")(hidden)
        k = DenseLinear(d, name="key")(hidden)
        v = DenseLinear(d, name="value")(hidden)

        def split(x):  # (b, s, d) -> (b, heads, nb, B, hd)
            x = x.reshape(b, s, self.num_heads, self.head_dim)
            return x.transpose(0, 2, 1, 3).reshape(
                b, self.num_heads, nb, B, self.head_dim
            )

        q, k, v = split(q), split(k), split(v)

        def halo_pad(x):  # zero halo blocks at both ends: (..., nb+2, B, hd)
            return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))

        ctx = banded_blocks(q, halo_pad(k), halo_pad(v), B, 0, s)
        ctx = ctx.reshape(b, self.num_heads, s, self.head_dim)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
        return DenseLinear(h, name="out")(ctx)


class SelfAttention(nn.Module):
    """BERT-style multi-head self-attention.

    Shapes follow the reference's test workloads: Q/K/V are
    (batch, heads, seq, head_dim) — the BERT-attention shape matrix of
    tests/cublas_kernel_test.py:66-69.
    """

    num_heads: int
    head_dim: int
    fused: bool = False  # flash-attention Pallas kernel (O(seq) memory)
    causal: bool = False

    @nn.compact
    def __call__(self, hidden, mask: Optional[jnp.ndarray] = None):
        b, s, h = hidden.shape
        d = self.num_heads * self.head_dim
        q = DenseLinear(d, name="query")(hidden)
        k = DenseLinear(d, name="key")(hidden)
        v = DenseLinear(d, name="value")(hidden)

        def split(x):
            return x.reshape(b, s, self.num_heads, self.head_dim).transpose(
                0, 2, 1, 3
            )

        q, k, v = split(q), split(k), split(v)

        if self.fused:
            if mask is not None:
                raise ValueError(
                    "fused attention supports causal masking only; pass "
                    "causal=True or use the unfused path for custom masks"
                )
            from tpusparse.kernels.flash_attention import flash_attention_diff

            ctx = flash_attention_diff(q, k, v, self.causal, None)
        else:
            # attention_scores = Q @ Kᵀ via the transposed-B batched op
            scores = ops.transb_mm(q, k) / np.sqrt(self.head_dim)
            if self.causal:
                cmask = jnp.tril(jnp.ones((s, s), bool))
                scores = jnp.where(cmask, scores, -1e9)
            if mask is not None:
                scores = jnp.where(mask, scores, -1e9)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = ops.mm(probs, v)  # (b, heads, s, head_dim)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
        return DenseLinear(h, name="out")(ctx)


def bigbird_block_mask(
    seq: int,
    block: int = 64,
    window_blocks: int = 3,
    num_global_blocks: int = 1,
    num_random_blocks: int = 2,
    seed: int = 0,
) -> np.ndarray:
    """The BigBird BLOCK-grid mask (nq, nk) — same three components as
    `bigbird_pattern` (which expands it to token CSR for the SDDMM path);
    this form feeds the fused block-flash kernel directly."""
    if seq % block:
        raise ValueError(f"seq {seq} must be a multiple of block {block}")
    nb = seq // block
    bi = np.arange(nb)[:, None]
    bj = np.arange(nb)[None, :]
    half = window_blocks // 2
    allowed = np.abs(bi - bj) <= half
    if num_global_blocks:
        allowed |= bj < num_global_blocks
        allowed |= bi < num_global_blocks
    if num_random_blocks and nb > window_blocks + num_global_blocks:
        rng = np.random.default_rng(seed)
        for r in range(nb):
            cand = np.flatnonzero(~allowed[r])
            if cand.size:
                pick = rng.choice(
                    cand, size=min(num_random_blocks, cand.size), replace=False
                )
                allowed[r, pick] = True
    return allowed


class BigBirdAttention(nn.Module):
    """Block-sparse attention on the fused block-flash kernel.

    Closes the r1 gap where BigBird patterns fed the SDDMM +
    segment-softmax path (per-nonzero gathers, ~90x slower than dense at
    seq 1024 — RESULTS.md): here the pattern's kv-block lists ride scalar
    prefetch into the flash kernel (kernels/flash_attention.py
    block_flash_attention), so unlisted blocks are never fetched or
    computed, the score matrix never exists, and every touched tile is
    an MXU-dense product. Compute scales with pattern density; fwd AND
    bwd are fused Pallas kernels (O(seq) memory).

    Numerically identical to dense attention masked to the block pattern.
    """

    num_heads: int
    head_dim: int
    # block=256 is the measured v5e sweet spot at seq 4096: 1.38 ms vs
    # 2.90 ms at block 128 (the kernel is grid/tile-bound below 256 —
    # bigger MXU dots beat the extra density) and equal to pure-banded
    # LocalAttention while adding global+random connectivity. The BigBird
    # paper's block 64 is a GPU-warp-sized choice; on TPU use >= 256.
    # The tile-launch bound keeps growing with seq: at seq 32768 block
    # 512 at COMPARABLE density runs 2.4x faster than 256 (17.2 vs
    # 41.4 ms, w1r1 vs w3r2 — ~6% coverage both), block 1024 w1r1 12.5 ms
    # at 12% — past ~16k sequences pick block >= 512 (the default stays
    # 256 because block size is part of the PATTERN semantics: window
    # and random coverage are measured in blocks of `block` tokens).
    block: int = 256
    window_blocks: int = 3
    num_global_blocks: int = 1
    num_random_blocks: int = 2
    pattern_seed: int = 0

    @nn.compact
    def __call__(self, hidden):
        from tpusparse.kernels.flash_attention import (
            BlockAttnPlan,
            block_flash_attention_diff,
        )

        b, s, h = hidden.shape
        d = self.num_heads * self.head_dim
        q = DenseLinear(d, name="query")(hidden)
        k = DenseLinear(d, name="key")(hidden)
        v = DenseLinear(d, name="value")(hidden)
        mask = bigbird_block_mask(
            s,
            self.block,
            self.window_blocks,
            self.num_global_blocks,
            self.num_random_blocks,
            self.pattern_seed,
        )
        plan = _block_attn_plan_cached(
            mask.tobytes(), mask.shape, self.block, s
        )

        def split(x):  # (b, s, d) -> (b*heads, s, hd)
            x = x.reshape(b, s, self.num_heads, self.head_dim)
            return x.transpose(0, 2, 1, 3).reshape(
                b * self.num_heads, s, self.head_dim
            )

        ctx = block_flash_attention_diff(split(q), split(k), split(v), plan)
        ctx = ctx.reshape(b, self.num_heads, s, self.head_dim)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
        return DenseLinear(h, name="out")(ctx)


@functools.lru_cache(maxsize=64)
def _block_attn_plan_cached(mask_bytes: bytes, mask_shape, block: int, seq: int):
    from tpusparse.kernels.flash_attention import BlockAttnPlan

    mask = np.frombuffer(mask_bytes, dtype=bool).reshape(mask_shape)
    return BlockAttnPlan(mask, block, block, seq)
