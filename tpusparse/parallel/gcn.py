"""Node-sharded GCN: full-batch graph training scaled over the mesh.

Distributed model family with no reference analog (the reference is
single-GPU, SURVEY.md §2.5): the normalized adjacency is row-partitioned
over the mesh with `parallel.spmm.shard_plan_rows` — each device owns a
contiguous block of output nodes and that block's plan — while the dense
projections stay replicated. Per layer the aggregation H' = Â (H W) runs
as `ops.spmm_blocks` inside `shard_map` (zero forward communication: B is
replicated, each device writes its node slice), so both forward and the
full backward (SDDMM dA, dense-fallback dB) are SPMD, matching
parallel/train.py's sharded-MLP recipe.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from tpusparse import ops
from tpusparse.parallel.mesh import shard_map
from tpusparse.parallel.spmm import RowShardedPlan, shard_plan_rows
from tpusparse.types import CSR

__all__ = [
    "shard_plan_rows",
    "make_sharded_gcn_forward",
    "make_sharded_gcn_train_step",
]


def _layer_names(model) -> Sequence[str]:
    return [f"conv{i+1}" for i in range(len(model.hidden))] + ["head"]


def make_sharded_gcn_forward(
    model, rsp: RowShardedPlan, mesh: Mesh, axis: str = "model"
):
    """(params, a_blocks, x) -> log-probs, with every layer's aggregation
    sharded by output-node block.

    `a_blocks = rsp.pack_values(a_hat.data)` packs the normalized
    adjacency once; params are `models.gcn.GCN` flax params (the layer
    algebra is replayed exactly — parity-tested against model.apply).
    """
    names = _layer_names(model)
    m = rsp.shape[0]
    bc = jnp.asarray(rsp.block_cols)
    ns = jnp.asarray(rsp.nslots)

    def aggregate(a_blocks, z):
        def body(bc_l, ns_l, blk_l, z_full):
            plan = rsp.local_plan(bc_l[0], ns_l[0])
            return ops.spmm_blocks(plan, blk_l[0], z_full)[None]

        out = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P()),
            out_specs=P(axis),
        )(bc, ns, a_blocks, z)
        return out.reshape(rsp.ndev * rsp.rows_per_dev, -1)[:m]

    def forward(params, a_blocks, x):
        p = params["params"]
        h = x
        for name in names:
            dl = p[name]["DenseLinear_0"]
            z = ops.transb_mm(h, dl["kernel"])
            if "bias" in dl:
                z = z + dl["bias"]
            h = aggregate(a_blocks, z)
            if name != "head":
                h = jax.nn.relu(h)
        return jax.nn.log_softmax(h, axis=-1)

    return forward


def make_sharded_gcn_train_step(
    model, rsp: RowShardedPlan, mesh: Mesh, tx, axis: str = "model"
) -> Any:
    """Jittable sharded full-batch node-classification step (masked NLL;
    same loss algebra as models.gcn.train_step)."""
    forward = make_sharded_gcn_forward(model, rsp, mesh, axis)

    def step(params, opt_state, a_blocks, x, labels, mask):
        def loss_fn(p):
            logp = forward(p, a_blocks, x)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    return step
