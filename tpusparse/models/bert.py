"""BERT-base attention layer — the reference's flagship integration target.

The reference patches HuggingFace BERT's attention-score matmul
(README.md:61-80) and times BERT-attention-shaped batched matmuls
(tests/cublas_kernel_test.py:66-69: batch×heads×seq×head_dim with
seq 512, heads 16, head_dim 64). Here the full attention layer is a
first-class model (BERT-base geometry: hidden 768, 12 heads, head_dim 64;
seq 128/512 per BASELINE configs[3]).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpusparse.nn.attention import LocalAttention, SelfAttention, SparseSelfAttention
from tpusparse.nn.layers import DenseLinear


class BertAttentionLayer(nn.Module):
    """Attention block: MHSA + residual/LN + FFN + residual/LN.

    attention='dense' is the reference workload; 'sparse' swaps in the
    general-pattern score path (SDDMM + segment softmax + SpMM) with a
    local+global pattern; 'local' is the banded fast path (blockwise
    dense MXU tiles, 13x over dense at seq 4096 on v5e) — both
    O(seq·window) instead of seq².
    """

    hidden: int = 768
    num_heads: int = 12
    intermediate: int = 3072
    attention: str = "dense"
    window: int = 64
    num_global: int = 0

    @nn.compact
    def __call__(self, x, mask=None):
        head_dim = self.hidden // self.num_heads
        if mask is not None and self.attention in ("local", "sparse", "bigbird"):
            # these variants carry their masking in the pattern itself; a
            # user-supplied mask would be silently ignored otherwise
            raise ValueError(
                f"attention={self.attention!r} does not accept a mask "
                "(its sparsity pattern IS the mask); use 'dense'"
            )
        if self.attention == "local":
            attn = LocalAttention(
                num_heads=self.num_heads,
                head_dim=head_dim,
                window=self.window,
                name="attention",
            )(x)
        elif self.attention == "sparse":
            attn = SparseSelfAttention(
                num_heads=self.num_heads,
                head_dim=head_dim,
                window=self.window,
                num_global=self.num_global,
                name="attention",
            )(x)
        elif self.attention == "bigbird":
            from tpusparse.nn.attention import BigBirdAttention

            attn = BigBirdAttention(
                num_heads=self.num_heads,
                head_dim=head_dim,
                block=self.window,
                name="attention",
            )(x)
        elif self.attention not in ("dense", "flash"):
            raise ValueError(
                f"unknown attention {self.attention!r}; options: "
                "'dense', 'flash', 'local', 'sparse', 'bigbird'"
            )
        else:
            attn = SelfAttention(
                num_heads=self.num_heads,
                head_dim=head_dim,
                fused=(self.attention == "flash"),
                name="attention",
            )(x, mask)
        x = nn.LayerNorm(name="ln1")(x + attn)
        h = DenseLinear(self.intermediate, name="ffn_in")(x)
        h = nn.gelu(h)
        h = DenseLinear(self.hidden, name="ffn_out")(h)
        return nn.LayerNorm(name="ln2")(x + h)


class BertEncoder(nn.Module):
    """Stack of attention blocks with embeddings — a full BERT-base-shaped
    encoder (the reference only ever benchmarks one attention layer's
    matmuls; this is the whole-model integration surface).
    """

    num_layers: int = 12
    hidden: int = 768
    num_heads: int = 12
    intermediate: int = 3072
    vocab_size: int = 30522
    max_position: int = 512
    attention: str = "dense"
    window: int = 64
    num_global: int = 0

    @nn.compact
    def __call__(self, input_ids, mask=None):
        b, s = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden, name="tok_emb")(input_ids)
        pos = nn.Embed(self.max_position, self.hidden, name="pos_emb")(
            jnp.arange(s)[None, :].repeat(b, axis=0)
        )
        x = nn.LayerNorm(name="emb_ln")(tok + pos)
        for i in range(self.num_layers):
            x = BertAttentionLayer(
                hidden=self.hidden,
                num_heads=self.num_heads,
                intermediate=self.intermediate,
                attention=self.attention,
                window=self.window,
                num_global=self.num_global,
                name=f"layer{i}",
            )(x, mask)
        return x
