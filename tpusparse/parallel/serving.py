"""Tensor-parallel quantized GPT decode: Megatron sharding for serving.

Completes the serving story at scale (SURVEY.md §2.5): the int8
deployment artifact (models/serving.QuantizedGPT) sharded over a
device mesh in the annotation style of parallel/bert.py —

  * q/k/v projection weights column-parallel (out features = heads split
    over 'model'), so per-head attention and the int8 KV cache shard by
    head with no communication inside the attention read;
  * attention-out and MLP-out row-parallel (input features sharded) —
    XLA all-reduces their partial sums over 'model';
  * MLP-in column-parallel (the Megatron pair);
  * lm_head column-parallel (vocab sharded; the greedy argmax's global
    reduction is XLA's to place);
  * embeddings/LayerNorms replicated, batch sharded over 'data'.

Weight streaming — the decode bottleneck — then splits 1/tp per chip,
so decode tokens/s scales with the model axis until the per-chip weight
stream stops dominating. Validated multi-device on the 8-way virtual
CPU mesh (tests/test_serving.py::test_tp_decode_matches_single_device,
__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusparse.models.serving import QuantizedGPT, _QBlock, _QLinear

__all__ = ["qgpt_param_specs", "shard_qgpt", "make_tp_decode_step"]


def _qlin_spec(lin: _QLinear, col: bool, model_axis: str, tp: int) -> _QLinear:
    """Specs for a _QLinear (qw stored (in, out)): column-parallel
    shards out features (scales/bias follow), row-parallel shards in
    features (scales/bias replicated — the partial sums reduce first).
    A layer whose sharded dimension does not divide the axis replicates
    (e.g. an lm_head with a non-multiple vocab)."""
    if col and lin.qw.shape[1] % tp == 0:
        return _QLinear(
            qw=P(None, model_axis), sw=P(model_axis), b=P(model_axis)
        )
    if not col and lin.qw.shape[0] % tp == 0:
        return _QLinear(qw=P(model_axis, None), sw=P(), b=P())
    return _QLinear(qw=P(), sw=P(), b=P())


def _split_qkv(qm: QuantizedGPT) -> QuantizedGPT:
    """Undo the single-device fused [q|k|v] projection: a fused out axis
    column-sharded over `model` would interleave q/k/v slices across
    devices, so TP wants the three per-head-shardable linears back. The
    fused layout is an exact concatenation — slicing reproduces the
    original quantized weights bit-for-bit."""
    blocks = []
    for blk in qm.blocks:
        if blk.qkv is None:
            blocks.append(blk)
            continue
        H = blk.qkv.qw.shape[1] // 3
        q, k, v = (
            _QLinear(
                qw=blk.qkv.qw[:, i * H : (i + 1) * H],
                sw=blk.qkv.sw[i * H : (i + 1) * H],
                b=blk.qkv.b[i * H : (i + 1) * H],
            )
            for i in range(3)
        )
        blocks.append(
            _QBlock(ln1=blk.ln1, ln2=blk.ln2, q=q, k=k, v=v, o=blk.o,
                    fc1=blk.fc1, fc2=blk.fc2, qkv=None)
        )
    return QuantizedGPT(
        blocks=tuple(blocks), tok_emb=qm.tok_emb, pos_emb=qm.pos_emb,
        final_ln=qm.final_ln, lm_head=qm.lm_head,
        num_heads=qm.num_heads, max_position=qm.max_position,
    )


def qgpt_param_specs(
    qm: QuantizedGPT, model_axis: str = "model", tp: int = 1
):
    """A QuantizedGPT-shaped pytree of PartitionSpecs (Megatron style).
    `tp` = size of the model axis (for divisibility fallbacks). Fused
    models are split first so the spec tree matches `_split_qkv` form."""
    qm = _split_qkv(qm)
    rep2 = (P(), P())
    blocks = tuple(
        _QBlock(
            ln1=rep2,
            ln2=rep2,
            q=_qlin_spec(blk.q, True, model_axis, tp),
            k=_qlin_spec(blk.k, True, model_axis, tp),
            v=_qlin_spec(blk.v, True, model_axis, tp),
            o=_qlin_spec(blk.o, False, model_axis, tp),
            fc1=_qlin_spec(blk.fc1, True, model_axis, tp),
            fc2=_qlin_spec(blk.fc2, False, model_axis, tp),
            qkv=None,
        )
        for blk in qm.blocks
    )
    return QuantizedGPT(
        blocks=blocks,
        tok_emb=P(),
        pos_emb=P(),
        final_ln=rep2,
        lm_head=_qlin_spec(qm.lm_head, True, model_axis, tp),
        num_heads=qm.num_heads,
        max_position=qm.max_position,
    )


def shard_qgpt(qm: QuantizedGPT, mesh: Mesh, model_axis: str = "model"):
    """device_put the quantized model onto the mesh with Megatron specs.

    num_heads must divide the model axis (head-parallel attention)."""
    tp = mesh.shape[model_axis]
    if qm.num_heads % tp != 0:
        raise ValueError(
            f"num_heads {qm.num_heads} must divide over model axis {tp}"
        )
    qm = _split_qkv(qm)
    specs = qgpt_param_specs(qm, model_axis, tp)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(qm, shardings), shardings


def make_tp_decode_step(
    qm_sharded: QuantizedGPT,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    flat_cache: bool = True,
):
    """Jitted (tok, cache, pos) -> (logits, cache) with batch over
    `data_axis`, KV cache head-sharded over `model_axis`, and the
    Megatron all-reduces placed by XLA at the row-parallel matmuls.

    `flat_cache` must match the layout `prefill` chose for the batch
    (flat (b, L, h·d) for batch ≤ QuantizedGPT._FLAT_BATCH_MAX, else
    head-major (b, h, L, d) — models/serving.py layout note)."""
    tok_s = NamedSharding(mesh, P(data_axis))
    # cache (kq, ks, vq, vs) per layer. Flat buffers (b, L, h·d) shard
    # batch x the head-major flat axis (heads are outer in h·d, so the
    # model split is an exact per-head partition); head-major buffers
    # (b, h, L, d) shard batch x heads. Scales (b, h) likewise.
    buf_s = NamedSharding(
        mesh,
        P(data_axis, None, model_axis)
        if flat_cache
        else P(data_axis, model_axis, None, None),
    )
    sc_s = NamedSharding(mesh, P(data_axis, model_axis))
    layer_s = (buf_s, sc_s, buf_s, sc_s)
    cache_s = tuple(layer_s for _ in qm_sharded.blocks)
    vocab = qm_sharded.lm_head.qw.shape[1]
    logits_s = NamedSharding(
        mesh,
        P(data_axis, model_axis)
        if vocab % mesh.shape[model_axis] == 0
        else P(data_axis),
    )

    def step(tok, cache, pos):
        return qm_sharded.decode_step(tok, cache, pos)

    return jax.jit(
        step,
        in_shardings=(tok_s, cache_s, None),
        out_shardings=(logits_s, cache_s),
    )
