"""MNIST FC-layer training benchmark — 3-way backend comparison.

TPU-native analog of the reference's MNIST benchmark (reference
benchmarks/mnist_benchmark.py:41-137): train the same single-FC-layer
(optionally +hidden) classifier under three backends — plain XLA Dense
(the regNet control), this framework's dense mm op (cubNet analog), and
the static-pattern tiled SpMM layer (cuspNet analog) — with the
reference's recipe (SGD lr=0.01 momentum=0.9, NLL loss on log_softmax,
batch 32) and log per-epoch wall time, average loss, and test accuracy
to `fc_layer_benchmark.log`.

Redesigns vs the reference: the train step is jitted once per variant
(the reference steps eagerly per batch); the sparse layer's pattern is
static so the inspector plan is built once, not per forward; data is
real MNIST when idx files are present (MNIST_DIR) else a learnable
synthetic stand-in (no network egress here).

Usage: python benchmarks/mnist_benchmark.py [--full] [--epochs N]
"""

from __future__ import annotations

import time

from common import base_parser, get_logger, log_and_print, setup_platform


def evaluate(model, params, x, y, batch=512):
    import jax.numpy as jnp
    import numpy as np

    correct = 0
    for i in range(0, len(x), batch):
        logits = model.apply(params, jnp.asarray(x[i : i + batch]))
        correct += int((np.asarray(jnp.argmax(logits, -1)) == y[i : i + batch]).sum())
    return correct / len(x)


def run_variant(logger, variant, data, epochs, batch_size, hidden, seed, eager):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpusparse.models.mlp import (
        MnistNet,
        make_train_state,
        train_epoch,
        train_step,
    )
    from tpusparse.utils.data import batches

    train_x, train_y, test_x, test_y = data
    model = MnistNet(variant=variant, hidden=hidden, sparse_density=0.1)
    params, tx, opt_state = make_train_state(
        model, jax.random.PRNGKey(seed), input_shape=(batch_size, 784)
    )
    step = jax.jit(train_step(model, tx))
    epoch_fn = jax.jit(train_epoch(model, tx))

    # warm the compiles outside the timed region
    wx = jnp.zeros((batch_size, 784), jnp.float32)
    wy = jnp.zeros((batch_size,), jnp.int32)
    if eager:
        jax.block_until_ready(step(params, opt_state, wx, wy)[2])
    else:
        jax.block_until_ready(
            epoch_fn(params, opt_state, wx[None], wy[None])[2]
        )

    for epoch in range(epochs):
        t0 = time.perf_counter()
        if eager:
            # the reference protocol: one host round trip per batch
            total_loss, n_batches = 0.0, 0
            for bx, by in batches(train_x, train_y, batch_size, seed=seed + epoch):
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(bx), jnp.asarray(by)
                )
                total_loss += float(loss)
                n_batches += 1
            avg_loss = total_loss / max(n_batches, 1)
        else:
            # device-side epoch: lax.scan over all batches, one round trip
            all_b = list(batches(train_x, train_y, batch_size, seed=seed + epoch))
            sx = jnp.asarray(np.stack([b[0] for b in all_b]))
            sy = jnp.asarray(np.stack([b[1] for b in all_b]))
            params, opt_state, losses = epoch_fn(params, opt_state, sx, sy)
            avg_loss = float(losses.mean())
        jax.block_until_ready(params)
        dt = time.perf_counter() - t0
        acc = evaluate(model, params, test_x, test_y)
        log_and_print(
            logger,
            f"[{variant}]{' (eager)' if eager else ''} epoch {epoch}: {dt:.3f}s, "
            f"avg loss {avg_loss:.4f}, test acc {acc:.4f}",
        )
    return acc


def main():
    p = base_parser("MNIST FC-layer benchmark (3 backends)")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--hidden", type=int, default=None)
    p.add_argument(
        "--eager",
        action="store_true",
        help="per-batch host stepping (the reference protocol); default is a "
        "device-side lax.scan epoch",
    )
    args = p.parse_args()

    logger = get_logger("mnist", "fc_layer_benchmark.log")
    setup_platform(cpu=args.cpu)

    from tpusparse.utils.data import load_mnist, synthetic_mnist

    data = load_mnist() if args.full else synthetic_mnist(seed=args.seed)
    hidden = args.hidden if args.hidden else (256 if args.full else None)
    log_and_print(
        logger,
        f"MNIST benchmark: {len(data[0])} train / {len(data[2])} test, "
        f"batch {args.batch_size}, hidden {hidden}, epochs {args.epochs}",
    )
    for variant in ("xla", "dense", "sparse"):
        acc = run_variant(
            logger, variant, data, args.epochs, args.batch_size, hidden,
            args.seed, args.eager,
        )
        assert acc > 0.5, f"{variant} failed to learn (acc {acc})"


if __name__ == "__main__":
    main()
