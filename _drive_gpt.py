"""TPU: GPT decode-loop throughput (GPT-2-small geometry) + parity."""
import json

import numpy as np

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from tpusparse.models import GPTDecoder, generate
from tpusparse.utils.timing import device_time_per_iter

m = GPTDecoder(num_layers=12, hidden=768, num_heads=12, intermediate=3072,
               vocab_size=32000, max_position=1024)
rng = np.random.default_rng(0)
B, P, S = 8, 128, 128  # batch, prompt len, generated tokens
ids = jnp.asarray(rng.integers(0, 32000, (B, P)).astype(np.int32))
params = m.init(jax.random.PRNGKey(0), ids)
nparams = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"params: {nparams/1e6:.1f}M", flush=True)

# quick parity on chip: decode vs full forward at one position
_, cache = m.apply(params, ids[:, :16], method=GPTDecoder.prefill)
lg, _ = m.apply(params, ids[:, 16], cache, 16, method=GPTDecoder.decode_step)
ref = m.apply(params, ids[:, :17])[:, -1, :]
rel = float(np.abs(np.asarray(lg) - np.asarray(ref)).max()
            / np.abs(np.asarray(ref)).max())
print(f"decode parity rel: {rel:.2e}", flush=True)
assert rel < 5e-3, rel

gen = jax.jit(lambda p, x: generate(m, p, x, steps=S))
out = np.asarray(gen(params, ids))  # compile + run
assert out.shape == (B, S)


def step(x):
    toks = gen(params, x)
    return x + (0 * toks.sum()).astype(x.dtype)


t = device_time_per_iter(step, ids, iters_lo=1, iters_hi=2, repeats=2)
tok_s = B * S / t
ms_tok = t / S * 1e3
print(f"decode: {ms_tok:.3f} ms/token (batch {B}) = {tok_s:,.0f} tok/s "
      f"incl. prefill({P})", flush=True)

res = {"params_M": nparams / 1e6, "batch": B, "prompt": P, "steps": S,
       "ms_per_token_incl_prefill": ms_tok, "tokens_per_s": tok_s,
       "decode_parity_rel": rel}
with open("_drive_gpt.json", "w") as f:
    json.dump(res, f, indent=1)
print("ALL OK", flush=True)
