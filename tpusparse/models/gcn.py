"""Graph Convolutional Network — sparse message passing as SpMM.

A model family with no reference analog (the reference integrates its
kernels into an MLP and BERT attention only, SURVEY.md §2.4): graph
neural networks are the canonical *consumer* of SpMM — each GCN layer is
H' = σ(Â H W) where Â is the symmetrically-normalized adjacency
(Kipf & Welling 2017) — so the layer rides `ops.spmm` with the
adjacency's plan built once and reused every step, and the elementwise
module supplies the normalization algebra (sp_add for self-loops,
row_reduce for degrees).

The adjacency pattern is a trace-time constant (the framework's standard
contract): one graph, one compiled train step.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpusparse import ops
from tpusparse.elementwise import sp_add
from tpusparse.linalg import speye
from tpusparse.nn.layers import DenseLinear
from tpusparse.types import CSR


def normalized_adjacency(adj: CSR, add_self_loops: bool = True) -> CSR:
    """Â = D^(-1/2) (A + I) D^(-1/2), the GCN propagation operator.

    Pattern work (self-loop union) is host-side; the value pass is pure
    jnp, so Â is differentiable in the input values if they are traced.
    """
    a1 = sp_add(adj, speye(adj.shape[0], adj.dtype)) if add_self_loops else adj
    deg = jax.ops.segment_sum(
        a1.data, a1.row_ids(), num_segments=a1.shape[0], indices_are_sorted=True
    )
    d_is = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    rows = a1.row_ids()
    cols = jnp.asarray(a1.indices)
    return CSR(
        data=a1.data * d_is[rows] * d_is[cols],
        indices=a1.indices,
        indptr=a1.indptr,
        shape=a1.shape,
    )


class GCNLayer(nn.Module):
    """One graph convolution: Â @ (X W) + b.

    The dense projection XW runs first (X is (n, f_in), W (f_in, f_out);
    projecting before aggregating moves the SpMM to the smaller f_out
    width — the standard ordering when f_out <= f_in).
    """

    features: int
    use_bias: bool = True
    spmm_method: str = "auto"

    @nn.compact
    def __call__(self, a_hat: CSR, x: jnp.ndarray) -> jnp.ndarray:
        h = DenseLinear(self.features, use_bias=self.use_bias)(x)
        return ops.spmm(a_hat, h, method=self.spmm_method)


class GCN(nn.Module):
    """Node-classification GCN: hidden graph convolutions with ReLU +
    dropout, then a linear graph-conv head to log-probabilities."""

    hidden: Sequence[int] = (64,)
    num_classes: int = 7
    dropout: float = 0.0
    spmm_method: str = "auto"

    @nn.compact
    def __call__(self, a_hat: CSR, x, deterministic: bool = True):
        for i, h in enumerate(self.hidden):
            x = GCNLayer(h, spmm_method=self.spmm_method, name=f"conv{i+1}")(
                a_hat, x
            )
            x = jax.nn.relu(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = GCNLayer(
            self.num_classes, spmm_method=self.spmm_method, name="head"
        )(a_hat, x)
        return jax.nn.log_softmax(x, axis=-1)


def random_graph(
    seed: int, num_nodes: int, avg_degree: float = 8.0, dtype=jnp.float32
) -> CSR:
    """Random undirected graph as a symmetric binary CSR adjacency."""
    rng = np.random.default_rng(seed)
    ne = int(num_nodes * avg_degree / 2)
    src = rng.integers(0, num_nodes, ne)
    dst = rng.integers(0, num_nodes, ne)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    import scipy.sparse as ssp

    a = ssp.coo_matrix(
        (np.ones(src.size, np.float32), (src, dst)),
        shape=(num_nodes, num_nodes),
    )
    a = ((a + a.T) > 0).astype(np.float32).tocsr()
    a.sort_indices()
    out = CSR.from_scipy(a)
    return CSR(out.data.astype(dtype), out.indices, out.indptr, out.shape)


def two_cluster_graph(
    seed: int,
    nodes_per_cluster: int = 64,
    p_in: float = 0.2,
    p_out: float = 0.01,
) -> Tuple[CSR, np.ndarray]:
    """Planted-partition graph + labels — a learnable synthetic task
    (the GCN must reach high accuracy from structure alone)."""
    rng = np.random.default_rng(seed)
    n = 2 * nodes_per_cluster
    labels = np.repeat(np.arange(2), nodes_per_cluster)
    same = labels[:, None] == labels[None, :]
    prob = np.where(same, p_in, p_out)
    upper = np.triu(rng.random((n, n)) < prob, k=1)
    dense = (upper | upper.T).astype(np.float32)
    return CSR.from_dense(jnp.asarray(dense)), labels


def gcn_reference(a_hat_dense: np.ndarray, params, x: np.ndarray) -> np.ndarray:
    """Host fp64 oracle for a GCN forward (tests only): replays the layer
    algebra with dense numpy matmuls on the given flax params."""
    h = x.astype(np.float64)
    layers = sorted(params["params"].keys(), key=lambda s: (s == "head", s))
    ah = a_hat_dense.astype(np.float64)
    for i, name in enumerate(layers):
        dl = params["params"][name]["DenseLinear_0"]
        w = np.asarray(dl["kernel"], np.float64)
        b = np.asarray(dl.get("bias", 0.0), np.float64)
        h = ah @ (h @ w.T + b)
        if name != "head":
            h = np.maximum(h, 0.0)
    return h - np.log(np.exp(h).sum(-1, keepdims=True))


def make_train_state(
    model: GCN,
    key,
    a_hat: CSR,
    x: jnp.ndarray,
    learning_rate: float = 1e-2,
):
    params = model.init(key, a_hat, x)
    tx = optax.adam(learning_rate)
    return params, tx, tx.init(params)


def train_step(model: GCN, tx) -> Any:
    """Jittable full-batch node-classification step (masked NLL)."""

    def step(params, opt_state, a_hat, x, labels, mask):
        def loss_fn(p):
            logp = model.apply(p, a_hat, x)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    return step
