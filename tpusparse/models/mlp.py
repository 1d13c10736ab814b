"""MNIST MLP and training step — end-to-end model integration.

TPU-native analog of the reference MNIST benchmark's three nets
(regNet/cubNet/cuspNet, benchmarks/mnist_benchmark.py:49-79: a single
784→10 FC layer + log_softmax) and its training recipe (SGD lr=0.01,
momentum 0.9, NLL loss, batch 32; mnist_benchmark.py:41-46,100-102).

Redesign: one model class with a backend variant ('xla' | 'dense' |
'sparse') instead of three copy-pasted nets, an optional hidden layer for
a non-trivial workload, and a jitted optax train step (the reference runs
eager per-batch Python).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpusparse.nn.layers import BlockSparseLinear, DenseLinear, Pattern, SparseLinear


class MnistNet(nn.Module):
    """variant: 'xla' (plain flax Dense — the regNet control), 'dense'
    (our mm ops — cubNet analog), 'sparse' (tiled SpMM — cuspNet analog),
    'blocksparse' (persistent packed-block weights — zero per-step pack).
    """

    variant: str = "dense"
    num_classes: int = 10
    hidden: Optional[int] = None  # reference nets have no hidden layer
    sparse_density: float = 0.1
    pattern_seed: int = 0

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        dims = ([self.hidden] if self.hidden else []) + [self.num_classes]
        for i, d in enumerate(dims):
            if self.variant == "xla":
                x = nn.Dense(d, name=f"fc{i+1}")(x)
            elif self.variant == "dense":
                x = DenseLinear(d, name=f"fc{i+1}")(x)
            elif self.variant == "sparse":
                pat = Pattern.random(
                    self.pattern_seed + i, (d, x.shape[-1]), self.sparse_density
                )
                x = SparseLinear(pattern=pat, name=f"fc{i+1}")(x)
            elif self.variant == "blocksparse":
                pat = Pattern.random(
                    self.pattern_seed + i, (d, x.shape[-1]), self.sparse_density
                )
                x = BlockSparseLinear(pattern=pat, name=f"fc{i+1}")(x)
            else:
                raise ValueError(f"unknown variant {self.variant!r}")
            if i < len(dims) - 1:
                x = jax.nn.relu(x)
        return jax.nn.log_softmax(x, axis=-1)


def nll_loss(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """NLLLoss on log_softmax outputs (mnist_benchmark.py:102)."""
    return -jnp.take_along_axis(log_probs, labels[:, None], axis=1).mean()


def make_train_state(
    model: MnistNet,
    key,
    input_shape: Tuple[int, ...] = (32, 784),
    learning_rate: float = 0.01,
    momentum: float = 0.9,
):
    params = model.init(key, jnp.zeros(input_shape))
    tx = optax.sgd(learning_rate, momentum=momentum)
    opt_state = tx.init(params)
    return params, tx, opt_state


def train_step(model: MnistNet, tx) -> Any:
    """Returns a jittable (params, opt_state, batch) -> (params, opt_state, loss)."""

    def step(params, opt_state, images, labels):
        def loss_fn(p):
            return nll_loss(model.apply(p, images), labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    return step


def train_epoch(model: MnistNet, tx) -> Any:
    """Whole-epoch device-side training via lax.scan over stacked batches.

    The reference steps eagerly per batch from Python
    (mnist_benchmark.py:96-121); on this TPU each host→device round trip
    costs ~25 ms, so a per-step Python loop measures the tunnel, not the
    model. Returns a jittable (params, opt_state, images (S, B, 784),
    labels (S, B)) -> (params, opt_state, losses (S,)).
    """
    step = train_step(model, tx)

    def epoch(params, opt_state, images, labels):
        def body(carry, batch):
            p, o = carry
            p, o, loss = step(p, o, batch[0], batch[1])
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (images, labels)
        )
        return params, opt_state, losses

    return epoch
