"""Graph Attention Network — SDDMM-flavored edge scoring + sparse
row-softmax + SpMM.

Second graph model family beyond the reference surface (the reference
integrates its kernels into an MLP and BERT attention only, SURVEY.md
§2.4). A GAT layer (Veličković et al. 2018) computes, per head,

    e_ij = LeakyReLU(a_src · W h_i + a_dst · W h_j)   on the edge pattern
    α    = row_softmax(e)                              (elementwise.row_softmax)
    h'_i = Σ_j α_ij · W h_j                            (ops.spmm)

which exercises the framework's full sparse-attention algebra: the edge
scores are a rank-1 SDDMM (separable a·h_i + a·h_j, so gathers beat a
dense outer product), the normalization is the sparse row-softmax, and
aggregation rides the plan-cached spmm — the adjacency pattern is a
trace-time constant, one compiled step per graph.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpusparse import ops
from tpusparse.elementwise import row_softmax, sp_add
from tpusparse.linalg import speye
from tpusparse.nn.layers import DenseLinear
from tpusparse.types import CSR


def add_self_loops(adj: CSR) -> CSR:
    """A + I — GAT attends over N(i) ∪ {i}. Host-side pattern work; call
    once outside the compiled step (the framework's plan contract)."""
    return sp_add(adj, speye(adj.shape[0], adj.dtype))


class GATLayer(nn.Module):
    """One multi-head graph attention layer over a CSR adjacency.

    `features` is the per-head width; heads are concatenated when
    `concat=True` (hidden layers) and averaged otherwise (output layer),
    following the original architecture.
    """

    features: int
    num_heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    use_bias: bool = True
    spmm_method: str = "auto"

    @nn.compact
    def __call__(self, adj: CSR, x: jnp.ndarray) -> jnp.ndarray:
        h = DenseLinear(self.features * self.num_heads, use_bias=False)(x)
        h = h.reshape(x.shape[0], self.num_heads, self.features)
        a_src = self.param(
            "att_src",
            nn.initializers.glorot_uniform(),
            (self.num_heads, self.features),
        )
        a_dst = self.param(
            "att_dst",
            nn.initializers.glorot_uniform(),
            (self.num_heads, self.features),
        )
        # separable SDDMM: score_ij = s_i + d_j gathered on the pattern
        src = jnp.einsum("nhf,hf->nh", h, a_src)
        dst = jnp.einsum("nhf,hf->nh", h, a_dst)
        rows = adj.row_ids()
        cols = jnp.asarray(adj.indices)
        e = nn.leaky_relu(
            src[rows] + dst[cols], negative_slope=self.negative_slope
        )  # (nnz, heads)
        outs = []
        for hd in range(self.num_heads):
            alpha = row_softmax(
                CSR(e[:, hd], adj.indices, adj.indptr, adj.shape)
            )
            outs.append(
                ops.spmm(alpha, h[:, hd, :], method=self.spmm_method)
            )
        out = (
            jnp.concatenate(outs, axis=-1)
            if self.concat
            else sum(outs) / self.num_heads
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (out.shape[-1],)
            )
            out = out + bias
        return out


class GAT(nn.Module):
    """Node-classification GAT: multi-head attention hidden layers with
    ELU, then a heads-averaged attention head to log-probabilities."""

    hidden: Sequence[int] = (8,)
    num_heads: int = 4
    num_classes: int = 7
    negative_slope: float = 0.2
    spmm_method: str = "auto"

    @nn.compact
    def __call__(self, adj: CSR, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.hidden):
            x = GATLayer(
                f,
                num_heads=self.num_heads,
                concat=True,
                negative_slope=self.negative_slope,
                spmm_method=self.spmm_method,
                name=f"gat{i+1}",
            )(adj, x)
            x = nn.elu(x)
        x = GATLayer(
            self.num_classes,
            num_heads=self.num_heads,
            concat=False,
            negative_slope=self.negative_slope,
            spmm_method=self.spmm_method,
            name="head",
        )(adj, x)
        return jax.nn.log_softmax(x, axis=-1)


def gat_layer_reference(
    adj_dense: np.ndarray,
    layer_params,
    x: np.ndarray,
    *,
    features: int,
    num_heads: int,
    concat: bool,
    negative_slope: float = 0.2,
) -> np.ndarray:
    """Host fp64 oracle for one GATLayer (tests only): dense masked
    attention replaying the layer algebra with numpy."""
    w = np.asarray(layer_params["DenseLinear_0"]["kernel"], np.float64)
    h = (x.astype(np.float64) @ w.T).reshape(x.shape[0], num_heads, features)
    a_src = np.asarray(layer_params["att_src"], np.float64)
    a_dst = np.asarray(layer_params["att_dst"], np.float64)
    src = np.einsum("nhf,hf->nh", h, a_src)
    dst = np.einsum("nhf,hf->nh", h, a_dst)
    mask = adj_dense != 0
    outs = []
    for hd in range(num_heads):
        e = src[:, hd][:, None] + dst[:, hd][None, :]
        e = np.where(e > 0, e, negative_slope * e)
        e = np.where(mask, e, -np.inf)
        emax = e.max(axis=1, keepdims=True)
        emax = np.where(np.isfinite(emax), emax, 0.0)  # empty rows
        p = np.exp(e - emax)
        p = np.where(mask, p, 0.0)
        s = p.sum(axis=1, keepdims=True)
        alpha = np.divide(p, s, out=np.zeros_like(p), where=s > 0)
        outs.append(alpha @ h[:, hd, :])
    out = (
        np.concatenate(outs, axis=-1) if concat else sum(outs) / num_heads
    )
    if "bias" in layer_params:
        out = out + np.asarray(layer_params["bias"], np.float64)
    return out


def make_train_state(
    model: GAT,
    key,
    adj: CSR,
    x: jnp.ndarray,
    learning_rate: float = 5e-3,
):
    params = model.init(key, adj, x)
    tx = optax.adam(learning_rate)
    return params, tx, tx.init(params)


def train_step(model: GAT, tx) -> Any:
    """Jittable full-batch node-classification step (masked NLL)."""

    def step(params, opt_state, adj, x, labels, mask):
        def loss_fn(p):
            logp = model.apply(p, adj, x)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    return step
