"""The reference README's BERT-attention patch (README.md:61-80),
tpusparse style.

Reference recipe: inside HuggingFace BERT, replace
    attention_scores = torch.matmul(query_layer, key_layer.transpose(-1, -2))
with
    attention_scores = matmuls.cublasTransbMM.apply(query_layer, key_layer)

tpusparse: the same substitution is `ts.transb_mm(q, k)` — or skip the
manual patching and use the provided attention modules, including the
block-sparse-score variant the reference only gestures at.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

import tpusparse as ts
from tpusparse.nn import SelfAttention, SparseSelfAttention

rng = np.random.default_rng(0)
batch, heads, seq, hd = 2, 4, 128, 16

# --- the manual patch: batched transposed matmul on 4-D tensors ---
q = jnp.asarray(rng.normal(size=(batch, heads, seq, hd)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(batch, heads, seq, hd)).astype(np.float32))
scores = ts.transb_mm(q, k)  # == q @ k.transpose(-1, -2)
ref = np.asarray(q, np.float64) @ np.asarray(k, np.float64).transpose(0, 1, 3, 2)
err = np.abs(np.asarray(scores, np.float64) - ref).max() / np.abs(ref).max()
assert err < 1e-4, err
print(f"  ts.transb_mm attention scores: rel err {err:.2e}")

# --- or the full modules ---
xh = jnp.asarray(rng.normal(size=(batch, seq, heads * hd)).astype(np.float32))
dense_attn = SelfAttention(num_heads=heads, head_dim=hd)
p = dense_attn.init(jax.random.PRNGKey(0), xh)
out = jax.jit(dense_attn.apply)(p, xh)
assert out.shape == xh.shape and np.isfinite(np.asarray(out)).all()
print("  SelfAttention (dense scores) OK")

sparse_attn = SparseSelfAttention(num_heads=heads, head_dim=hd, window=16)
p = sparse_attn.init(jax.random.PRNGKey(0), xh)
out = jax.jit(sparse_attn.apply)(p, xh)
assert out.shape == xh.shape and np.isfinite(np.asarray(out)).all()
print("  SparseSelfAttention (banded scores, never materializes seq^2) OK")
print("04_bert_attention: OK  (flash/local/ring variants: kernels/"
      "flash_attention.py, nn.LocalAttention, parallel/attention.py)")
