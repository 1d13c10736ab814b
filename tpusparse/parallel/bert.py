"""Tensor-parallel BERT attention: Megatron-style sharding over a mesh.

New capability beyond the single-GPU reference (SURVEY.md §2.5): the
attention block's parameters are annotated with PartitionSpecs so XLA
inserts the collectives —

  * query/key/value kernels (out, in) column-parallel: heads split over
    'model' (P('model', None)), so per-head score/context products are
    local to a shard
  * attention output kernel row-parallel (P(None, 'model')) — its matmul
    produces partial sums that XLA all-reduces over 'model'
  * FFN in column-parallel, FFN out row-parallel (the Megatron pair)
  * activations sharded over 'data' (batch)

This is the sharding-annotation style of SPMD (vs the explicit shard_map
style in parallel/train.py) — both are first-class JAX; the annotation
style lets XLA choose collective placement and overlaps.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def bert_param_specs(
    params: Any, model_axis: str = "model"
) -> Any:
    """PartitionSpec pytree for BertAttentionLayer/BertEncoder params.

    Column-parallel: q/k/v and ffn_in kernels + biases (output features
    sharded). Row-parallel: attention out and ffn_out kernels (input
    features sharded; biases replicated). Everything else replicated.
    Kernels are (out, in) — the framework's torch-layout DenseLinear.
    """

    def spec(path, leaf):
        name = jax.tree_util.keystr(path)
        ndim = getattr(leaf, "ndim", 0)
        col = any(t in name for t in ("query", "key", "value", "ffn_in"))
        row = any(t in name for t in ("'out'", "ffn_out"))
        if "kernel" in name and ndim == 2:
            if col:
                return P(model_axis, None)
            if row:
                return P(None, model_axis)
        if "bias" in name and ndim == 1 and col:
            return P(model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_bert_params(params: Any, mesh: Mesh, model_axis: str = "model"):
    """device_put the params tree onto the mesh with Megatron specs."""
    specs = bert_param_specs(params, model_axis)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings), shardings


def make_tp_forward(layer, mesh: Mesh, shardings, data_axis: str = "data"):
    """Jit the layer's apply with batch sharded over `data_axis` and
    params sharded per `shardings`; XLA inserts the model-axis
    all-reduces at the row-parallel matmuls."""
    x_sharding = NamedSharding(mesh, P(data_axis, None, None))

    return jax.jit(
        layer.apply,
        in_shardings=(shardings, x_sharding),
        out_shardings=x_sharding,
    )


def validate_tp_heads(num_heads: int, mesh: Mesh, model_axis: str = "model"):
    tp = mesh.shape[model_axis]
    if num_heads % tp != 0:
        raise ValueError(
            f"num_heads {num_heads} must divide over model axis size {tp}"
        )
