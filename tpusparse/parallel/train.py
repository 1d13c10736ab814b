"""Explicit-SPMD distributed training step (data × model parallel).

The reference's training loop is single-GPU eager (mnist_benchmark.py:
96-137). This is its multi-chip redesign: a sparse-MLP train step
shard_mapped over a ('data', 'model') mesh —

  * batch sharded over 'data'
  * the sparse layer-1 weight row-partitioned (output neurons) over
    'model', stored directly in ELL block form with a static 0/1 block
    mask so SGD stays sparse
  * hidden activations all_gathered over 'model' (AD turns that into a
    psum_scatter in the backward pass)
  * gradients psum'd over 'data'

Loss/optimizer match the reference recipe: NLL on log_softmax, SGD with
momentum (mnist_benchmark.py:100-102).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusparse import ops
from tpusparse.nn.layers import Pattern
from tpusparse.parallel.mesh import shard_map
from tpusparse.parallel.spmm import RowShardedPlan, shard_plan_rows


@dataclass(frozen=True)
class ShardedMLPConfig:
    in_features: int = 784
    hidden: int = 256
    num_classes: int = 10
    density: float = 0.1
    pattern_seed: int = 0
    learning_rate: float = 0.01
    momentum: float = 0.9
    blocksize: Tuple[int, int] = (8, 128)


def make_sharded_train_state(cfg: ShardedMLPConfig, mesh: Mesh, key):
    """Build (params, mask/plan constants, optimizer, opt_state).

    w1 lives as (tp, slots, bm, bk) packed blocks sharded over 'model';
    the static block mask keeps SGD updates inside the sparsity pattern.
    """
    tp = mesh.shape["model"]
    pat = Pattern.random(cfg.pattern_seed, (cfg.hidden, cfg.in_features), cfg.density)
    csr = pat.to_csr(jnp.zeros((pat.nnz,), jnp.float32))
    rsp = shard_plan_rows(csr, tp, cfg.blocksize)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(cfg.in_features)
    values = jax.random.uniform(k1, (pat.nnz,), minval=-bound, maxval=bound)
    w1_blocks = rsp.pack_values(values)  # (tp, slots, bm, bk)
    mask = np.asarray(rsp.pack_values(jnp.ones((pat.nnz,), jnp.float32)))

    params = {
        "w1_blocks": w1_blocks,
        "b1": jax.random.uniform(k2, (cfg.hidden,), minval=-bound, maxval=bound),
        "w2": jax.random.uniform(
            k3,
            (cfg.num_classes, cfg.hidden),
            minval=-1 / np.sqrt(cfg.hidden),
            maxval=1 / np.sqrt(cfg.hidden),
        ),
        "b2": jax.random.uniform(
            k4,
            (cfg.num_classes,),
            minval=-1 / np.sqrt(cfg.hidden),
            maxval=1 / np.sqrt(cfg.hidden),
        ),
    }
    # lay params out on the mesh: w1 sharded over 'model', rest replicated
    params = jax.device_put(
        params,
        {
            "w1_blocks": NamedSharding(mesh, P("model")),
            "b1": NamedSharding(mesh, P()),
            "w2": NamedSharding(mesh, P()),
            "b2": NamedSharding(mesh, P()),
        },
    )
    tx = optax.sgd(cfg.learning_rate, momentum=cfg.momentum)
    opt_state = tx.init(params)
    return params, rsp, jnp.asarray(mask), tx, opt_state


def make_sharded_train_step(cfg: ShardedMLPConfig, mesh: Mesh, rsp: RowShardedPlan, tx):
    """Returns jitted (params, opt_state, mask, x, y) -> (params, opt_state, loss).

    x: (batch, in_features) sharded over 'data'; y: (batch,) likewise.
    """
    tp = mesh.shape["model"]
    hidden_pad = tp * rsp.rows_per_dev

    def local_forward(p, mask_l, bc_l, ns_l, x_l):
        plan = rsp.local_plan(bc_l, ns_l)
        w1_eff = p["w1_blocks"][0] * mask_l[0]
        # (rows_per_dev, batch_l) local output neurons
        h_part = ops.spmm_blocks(plan, w1_eff, jnp.swapaxes(x_l, 0, 1))
        # gather all output-neuron shards: (hidden_pad, batch_l)
        h = lax.all_gather(h_part, "model", axis=0, tiled=True)
        h = h[: cfg.hidden] + p["b1"][:, None]
        h = jax.nn.relu(h)
        logits = p["w2"] @ h + p["b2"][:, None]  # (classes, batch_l)
        return jax.nn.log_softmax(logits, axis=0)

    def local_step(p, mask_l, bc_l, ns_l, x_l, y_l, global_batch):
        def loss_fn(p):
            logp = local_forward(p, mask_l, bc_l, ns_l, x_l)
            picked = jnp.take_along_axis(logp, y_l[None, :], axis=0)
            return -lax.psum(picked.sum(), "data") / global_batch

        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = jax.tree_util.tree_map(lambda g: lax.psum(g, "data"), grads)
        return loss, grads

    bc = jnp.asarray(rsp.block_cols)
    ns = jnp.asarray(rsp.nslots)

    @jax.jit
    def step(params, opt_state, mask, x, y):
        global_batch = x.shape[0]

        def body(p, mask_l, bc_l, ns_l, x_l, y_l):
            loss, grads = local_step(
                p, mask_l, bc_l[0], ns_l[0], x_l, y_l, global_batch
            )
            return loss, grads

        loss, grads = shard_map(
            body,
            mesh=mesh,
            in_specs=(
                {
                    "w1_blocks": P("model"),
                    "b1": P(),
                    "w2": P(),
                    "b2": P(),
                },
                P("model"),
                P("model"),
                P("model"),
                P("data"),
                P("data"),
            ),
            out_specs=(
                P(),
                {
                    "w1_blocks": P("model"),
                    "b1": P(),
                    "w2": P(),
                    "b2": P(),
                },
            ),
        )(params, mask, bc, ns, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
