"""BERT-base attention layer step-time benchmark (seq 128 / 512).

BASELINE configs[3] workload: the reference times BERT-attention-shaped
batched matmuls (reference tests/cublas_kernel_test.py:66-69) and
documents patching HF BERT's score matmul (README.md:61-80). Here the
whole attention layer is a model (tpusparse/models/bert.py) and this
script reports forward and full train-step (fwd+bwd+SGD) device time per
layer at seq 128 and 512, for the dense layer and the block-sparse
attention-score variant.

Usage: python benchmarks/bert_attention_benchmark.py [--full] [--batch 8]
"""

from __future__ import annotations

import json

from common import artifact_path, base_parser, get_logger, log_and_print, setup_platform


def bench_layer(seq, batch, seed, attention="dense", window=64):
    # 'local' = blockwise banded MXU path; 'sparse' = general-pattern SDDMM
    # path (slow at these seq lengths; included as the capability check)
    import jax
    import jax.numpy as jnp
    import optax

    from tpusparse.models import BertAttentionLayer
    from tpusparse.utils.timing import device_time_per_iter, normalizing

    layer = BertAttentionLayer(attention=attention, window=window)
    x = jax.random.normal(jax.random.PRNGKey(seed), (batch, seq, 768))
    params = layer.init(jax.random.PRNGKey(seed + 1), x)

    fwd_ms = (
        device_time_per_iter(
            normalizing(lambda v: layer.apply(params, v)), x, iters_lo=2, iters_hi=8
        )
        * 1e3
    )

    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(p, v):
        return jnp.mean(layer.apply(p, v) ** 2)

    def train_step(state):
        p, o, v = state
        loss, grads = jax.value_and_grad(loss_fn)(p, v)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, v

    step_ms = (
        device_time_per_iter(train_step, (params, opt_state, x), iters_lo=2, iters_hi=8)
        * 1e3
    )
    return {"seq": seq, "batch": batch, "attention": attention,
            "fwd_ms": fwd_ms, "train_step_ms": step_ms}


def main():
    p = base_parser("BERT-base attention layer step time")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--long-seq", action="store_true",
                   help="add the seq-4096 dense/flash/local/bigbird grid")
    args = p.parse_args()
    logger = get_logger("bert", "bert_attention_benchmark.log")
    setup_platform(cpu=args.cpu)

    seqs = (128, 512) if args.full else (128,)
    batch = args.batch if args.full else 2
    results = []
    for seq in seqs:
        for attention in ("dense", "local", "sparse"):
            r = bench_layer(seq, batch, args.seed, attention=attention)
            results.append(r)
            log_and_print(
                logger,
                f"seq {seq} batch {batch} [{attention}]: fwd {r['fwd_ms']:.3f} ms, "
                f"train step {r['train_step_ms']:.3f} ms",
            )
    if args.long_seq:
        # long-context comparison at seq 4096 (r2 VERDICT item 2's gate:
        # bigbird within ~2x of local and >=5x over dense); 'sparse'
        # (the SDDMM path) is excluded — it is the ~90x-slower general-
        # pattern engine bigbird replaces
        for attention in ("dense", "flash", "local", "bigbird"):
            # local's banded fast path peaks at window 128; the bigbird
            # block-flash kernel is tile-bound below block 256 (measured)
            w = 256 if attention == "bigbird" else 128
            r = bench_layer(4096, max(args.batch // 4, 1), args.seed,
                            attention=attention, window=w)
            results.append(r)
            log_and_print(
                logger,
                f"seq 4096 [{attention}]: fwd {r['fwd_ms']:.3f} ms, "
                f"train step {r['train_step_ms']:.3f} ms",
            )
    with open(artifact_path("bert_attention_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
