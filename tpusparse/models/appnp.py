"""APPNP — Approximate Personalized Propagation of Neural Predictions.

A model family with no reference analog (SURVEY.md §2.4; the reference
integrates into an MLP and BERT attention only). Klicpera et al.'s
"predict then propagate": an MLP produces per-node logits H, then K
power-iteration steps of personalized PageRank diffuse them over the
graph — Z⁰ = H, Zˡ⁺¹ = (1−α)·Â·Zˡ + α·H — which decouples feature
transformation depth from propagation depth.

TPU-first shape: the propagation is K plan-cached `ops.spmm` calls with
the SAME plan (inspect-once / multiply-many is exactly this op's
lifecycle), rolled into `lax.fori_loop` so the compiled program is
K-independent in size; the MLP rides the framework's dense ops.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpusparse import ops
from tpusparse.nn.layers import DenseLinear
from tpusparse.types import CSR

__all__ = ["APPNP", "appnp_propagate", "train_step"]


def appnp_propagate(
    a_hat: CSR, h: jnp.ndarray, alpha: float = 0.1, k: int = 10
) -> jnp.ndarray:
    """K personalized-PageRank steps: Zˡ⁺¹ = (1−α)·Â·Zˡ + α·H."""

    def body(_, z):
        return (1.0 - alpha) * ops.spmm(a_hat, z) + alpha * h

    return jax.lax.fori_loop(0, k, body, h)


class APPNP(nn.Module):
    """MLP prediction + PPR propagation; returns log-probs like
    `models.gcn.GCN` (drop-in for the same trainers)."""

    hidden: Sequence[int] = (64,)
    num_classes: int = 2
    alpha: float = 0.1
    k: int = 10

    @nn.compact
    def __call__(self, a_hat: CSR, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for i, width in enumerate(self.hidden):
            h = jax.nn.relu(DenseLinear(width, name=f"mlp{i+1}")(h))
        h = DenseLinear(self.num_classes, name="head")(h)
        z = appnp_propagate(a_hat, h, self.alpha, self.k)
        return jax.nn.log_softmax(z, axis=-1)


def train_step(model: APPNP, tx) -> Any:
    """Jittable full-batch node-classification step (masked NLL; same
    trainer contract as models.gcn.train_step)."""

    def step(params, opt_state, a_hat, x, labels, mask):
        def loss_fn(p):
            logp = model.apply(p, a_hat, x)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    return step
