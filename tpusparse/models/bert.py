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

from tpusparse.nn.attention import SelfAttention
from tpusparse.nn.layers import DenseLinear


class BertAttentionLayer(nn.Module):
    """Attention block: MHSA + residual/LN + FFN + residual/LN."""

    hidden: int = 768
    num_heads: int = 12
    intermediate: int = 3072

    @nn.compact
    def __call__(self, x, mask=None):
        head_dim = self.hidden // self.num_heads
        attn = SelfAttention(
            num_heads=self.num_heads, head_dim=head_dim, name="attention"
        )(x, mask)
        x = nn.LayerNorm(name="ln1")(x + attn)
        h = DenseLinear(self.intermediate, name="ffn_in")(x)
        h = nn.gelu(h)
        h = DenseLinear(self.hidden, name="ffn_out")(h)
        return nn.LayerNorm(name="ln2")(x + h)
