"""Round-2 capabilities: int8 serving, real-matrix ingestion, BigBird
block-flash attention, arg-tracking reducers, and router calibration.

Covers the serving/deployment story the reference's inspect-once /
multiply-many lifecycle points at (custom_mm.cpp:283-357), extended with
quantization, Matrix Market data, and block-sparse fused attention.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as ssp

import tpusparse as ts

rng = np.random.default_rng(0)

# --- int8 serving: quantize the sparse weight ONCE, stream activations ----
# (per-block weight scales + per-column activation scales; one s8xs8->s32
# MXU pass per slot — measured 2.78x over the fp32 resident executor on
# the 16384^2 headline, rel err ~1e-2 = int8's information limit)
w_sp = ssp.random(256, 512, 0.1, format="csr",
                  random_state=np.random.RandomState(1)).astype(np.float32)
qa = ts.QuantizedMatrix(ts.CSR.from_scipy(w_sp), blocksize=(8, 16))
x = jnp.asarray(rng.standard_normal((512, 32)).astype(np.float32))
y8 = np.asarray(qa @ x)
ref = w_sp.toarray().astype(np.float64) @ np.asarray(x, np.float64)
rel = np.abs(y8 - ref).max() / np.abs(ref).max()
print(f"int8 serving rel err: {rel:.2e}")
assert rel < 2e-2
print(f"weight storage audit: {qa.quantization_error(ts.CSR.from_scipy(w_sp)):.2e}")

# --- real matrices: Matrix Market files or the stand-in catalog ----------
from tpusparse.utils.matrices import describe, get_matrix, save_mtx, load_mtx

A = get_matrix("laplace2d_256")  # or any .mtx / .mtx.gz path
print(describe("laplace2d_256"))
v = jnp.ones((A.shape[1],), jnp.float32)
y = np.asarray(ts.spmm(A, v))  # router sends the banded FEM class to DIA
from tpusparse.ops import _route_spmm

print("router choice for the FEM stencil:",
      _route_spmm(A, v[:, None], None))
ref_y = A.to_scipy().astype(np.float64) @ np.ones(A.shape[1])
assert np.abs(y - ref_y).max() < 1e-3

# round-trip through a .mtx.gz file
import tempfile

with tempfile.TemporaryDirectory() as d:
    p = os.path.join(d, "lap.mtx.gz")
    small = get_matrix("blocked_4k")
    save_mtx(p, small)
    back = load_mtx(p)
    assert (back.to_scipy() != small.to_scipy()).nnz == 0
print("Matrix Market round-trip ok")

# --- arg-tracking reducers (the reference kernel's arg_out contract) ------
a_small = ts.random_csr(3, (32, 48), 0.1)
bmat = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
vals, arg = ts.spmm(a_small, bmat, reduce="max", return_arg=True)
evals, earg = ts.spmm_reference(a_small, bmat, reduce="max", return_arg=True)
assert (np.asarray(arg) == np.asarray(earg)).all()
print("argmax SpMM matches the reference contract (nnz index per extremum)")

# --- BigBird block-pattern flash attention --------------------------------
# window + global + random blocks fused into the flash kernel: unlisted
# kv blocks are never fetched, compute scales with pattern density
from tpusparse.nn import BigBirdAttention, bigbird_block_mask

layer = BigBirdAttention(num_heads=2, head_dim=16, block=32,
                         window_blocks=3, num_global_blocks=1,
                         num_random_blocks=1)
h = jnp.asarray(rng.standard_normal((2, 128, 32)).astype(np.float32))
params = layer.init(jax.random.PRNGKey(0), h)
out = layer.apply(params, h)
assert np.isfinite(np.asarray(out)).all()
mask = bigbird_block_mask(128, block=32)
print(f"BigBird attention: {mask.mean():.0%} of blocks computed, "
      f"output {out.shape}")

# --- router self-calibration (persist a per-chip cost-model fit) ----------
# ts.calibrate() measures on a real TPU and persists; here we just show
# the constants in effect (a saved fit for THIS backend/device kind
# loads automatically on first routing use)
consts = ts.ops.get_cost_constants()
print(f"router constants in effect: dense {consts['dense_fp32_flops']/1e12:.0f} "
      f"TFLOP/s, gather {consts['gather_row_bw']/1e9:.0f} GB/s, "
      f"dia {consts['dia_bw']/1e9:.0f} GB/s")
print("ok")

# --- dense int8 serving (r3): the precision ladder's serving rung ---------
# per-row weight scales quantized ONCE, per-column activation scales per
# call, one exact s8xs8->s32 MXU pass (2.05x bf16 measured on v5e)
w = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
qd = ts.QuantizedDense(w)
x = jnp.asarray(rng.standard_normal((256, 16)).astype(np.float32))
y = qd @ x
ref = np.asarray(w, np.float64) @ np.asarray(x, np.float64)
rel = float(np.abs(np.asarray(y) - ref).max() / np.abs(ref).max())
assert rel < 5e-2
print(f"QuantizedDense serving: rel err {rel:.1e} (int8 information limit)")

# --- irregular-pattern attention routing (r3) ----------------------------
# ANY token-level pattern rides the best of three engines; the decision
# and its projected costs are inspectable
from tpusparse.nn import local_global_pattern, route_sparse_attention

ind, ptr = local_global_pattern(1024, 40, 3)
method, plan, report = route_sparse_attention(ind, ptr, 1024)
print(f"attention route @seq1024 -> {method}")
print(" ", report)

# --- end-to-end quantized GPT serving (r4) --------------------------------
# the whole-model serving artifact: int8 weights + int8 KV cache decode,
# built from a trained float GPTDecoder in one call
from tpusparse.models import GPTDecoder, quantize_gpt

gpt = GPTDecoder(num_layers=2, hidden=64, num_heads=4, intermediate=128,
                 vocab_size=100, max_position=32)
ids = jnp.asarray(rng.integers(0, 100, (1, 8)).astype(np.int32))
gparams = gpt.init(jax.random.PRNGKey(1), ids)
qgpt = quantize_gpt(gpt, gparams)
lg_q, cache = qgpt.prefill(ids)
lg_f = gpt.apply(gparams, ids)
rel = float(np.abs(np.asarray(lg_q) - np.asarray(lg_f)).max()
            / np.abs(np.asarray(lg_f)).max())
assert rel < 5e-2
toks = qgpt.generate(ids, 4)
print(f"QuantizedGPT: prefill rel err {rel:.1e} vs float model, "
      f"generated {toks.shape} tokens (int8 weights + int8 KV cache)")
