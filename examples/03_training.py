"""FC-layer training (the reference's cublasLinear / cusparseLinear +
mnist_benchmark.py workflow) — plus dynamic sparse training, which the
reference cannot do.

Reference: swap `nn.Linear` for `cublasLinear(in, out)` in a torch
module and train normally. Here: `DenseLinear` / `SparseLinear` are
flax modules over the framework's autograd ops.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpusparse.nn import DenseLinear, SparseLinear

rng = np.random.default_rng(0)

# a small regression task
x = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))
w_true = rng.normal(size=(64, 10)).astype(np.float32)
y = x @ jnp.asarray(w_true)


def train(model, steps=300, lr=3e-2):
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(
            lambda p: jnp.mean((model.apply(p, x) - y) ** 2)
        )(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(steps):
        params, opt, loss = step(params, opt)
        first = first if first is not None else float(loss)
    return first, float(loss)


# dense FC layer (reference: cublasLinear)
l0, l1 = train(DenseLinear(10))
print(f"  DenseLinear:  loss {l0:.3f} -> {l1:.4f}")
assert l1 < 0.01 * l0

# static-sparse FC layer (reference: cusparseLinear — but here the
# WEIGHT is sparse and training stays sparse end to end)
l0, l1 = train(SparseLinear.random(0, 64, 10, density=0.5))
print(f"  SparseLinear: loss {l0:.3f} -> {l1:.4f}")
assert l1 < 0.5 * l0

print("03_training: OK  (for the full MNIST run: benchmarks/mnist_benchmark.py;"
      " for RigL prune/regrow training: tests/test_rigl.py)")
