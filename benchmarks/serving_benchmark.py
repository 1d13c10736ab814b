"""End-to-end GPT decode serving benchmark (r4 verdict task 8).

Ties the serving ladder together: one ~350M-param GPT decode step,
bf16 weights vs int8 weights + int8 KV cache (models/serving.py), at
batch 1 and 8, reporting tokens/s and the honest quality delta (logit
rel err + top-1 agreement vs the float model over real decode steps).

A decode step at this scale is weight-traffic-bound (every parameter
streams through HBM per token; the KV-cache read is second) — the
measured tokens/s should track the bytes-streamed ratio, and the row
records that roofline alongside.

Long TPU run (4 chained-timer compiles of a 24-layer decode step) —
launch under nohup and poll (CLAUDE.md tunnel note).

Usage: python benchmarks/serving_benchmark.py [--layers 24 --hidden 1024]
"""

import json

import numpy as np

from common import base_parser, get_logger, log_and_print, setup_platform


def main():
    ap = base_parser("GPT decode serving benchmark")
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--intermediate", type=int, default=4096)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--max-position", type=int, default=512)
    ap.add_argument("--batches", default="1,8")
    args = ap.parse_args()
    setup_platform(cpu=args.cpu)

    import jax
    import jax.numpy as jnp

    from tpusparse.models import GPTDecoder, quantize_gpt
    from tpusparse.utils.timing import device_time_per_iter

    logger = get_logger("serving", "serving_benchmark.log")

    m = GPTDecoder(
        num_layers=args.layers, hidden=args.hidden, num_heads=args.heads,
        intermediate=args.intermediate, vocab_size=args.vocab,
        max_position=args.max_position,
    )
    rng = np.random.default_rng(args.seed)
    ids0 = jnp.asarray(rng.integers(0, args.vocab, (1, 8)).astype(np.int32))
    params = m.init(jax.random.PRNGKey(0), ids0)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )

    qm = quantize_gpt(m, params)
    params16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    # honest quality delta at batch 1: drive 24 real decode steps from a
    # random prompt through BOTH tiers; report logit rel err + top-1 match
    prompt = jnp.asarray(
        rng.integers(0, args.vocab, (1, 16)).astype(np.int32)
    )
    # Params/the quantized instance ride as jit ARGUMENTS throughout: a
    # ~350M-param tree closed over in a jitted step embeds as HLO
    # literals, and the tunnel rejects compile payloads past ~100 MB
    # (HTTP 413 — found the hard way on the AMG hierarchy, CLAUDE.md).
    lg_f, cache_f = m.apply(params, prompt, method=GPTDecoder.prefill)
    lg_q, cache_q = qm.prefill(prompt)
    step_f = jax.jit(
        lambda w, t, c, p: m.apply(w, t, c, p, method=GPTDecoder.decode_step)
    )
    step_q = jax.jit(lambda q, t, c, p: q.decode_step(t, c, p))
    tok_f = jnp.argmax(lg_f[:, -1, :], axis=-1).astype(jnp.int32)
    tok_q = jnp.argmax(lg_q[:, -1, :], axis=-1).astype(jnp.int32)
    agree, rel_errs = 0, []
    n_steps = 24
    for i in range(n_steps):
        lf, cache_f = step_f(params, tok_f, cache_f, 16 + i)
        lq, cache_q = step_q(qm, tok_f, cache_q, 16 + i)  # same tokens
        a, b = np.asarray(lq, np.float64), np.asarray(lf, np.float64)
        rel_errs.append(float(np.abs(a - b).max() / np.abs(b).max()))
        agree += int(np.argmax(a) == np.argmax(b))
        tok_f = jnp.argmax(lf, axis=-1).astype(jnp.int32)
    quality = {
        "logit_rel_err_max": max(rel_errs),
        "top1_agreement": agree / n_steps,
        "steps": n_steps,
    }
    del cache_f, cache_q, params  # fp32 tree no longer needed on device

    w_bytes_bf16 = 2.0 * n_params
    w_bytes_int8 = float(n_params)  # embeddings stay bf16 but are a gather

    rec_all = {
        "params_m": round(n_params / 1e6, 1),
        "config": {
            "layers": args.layers, "hidden": args.hidden,
            "heads": args.heads, "vocab": args.vocab,
            "cache_len": args.max_position,
        },
        "quality_int8_vs_fp32": quality,
    }

    # Timing: one jitted greedy `generate` (prefill + lax.scan of decode
    # steps) per tier, with the weight tree as a jit ARGUMENT (no
    # literals, no per-step re-pack — scan treats it as loop-invariant).
    # Per-token time is the S_HI/S_LO run DIFFERENCE: prefill, argmax
    # plumbing, and the ~25 ms dispatch overhead cancel, leaving
    # (S_HI − S_LO) genuinely sequential decode steps — the serving
    # metric. Chained per-step timers can't express this workload
    # without closing over the weights (413) or threading the full tree
    # through the loop carry (measured 2x timer artifact, CLAUDE.md r3).
    import functools
    import time as _time2

    from tpusparse.models.gpt import generate as gpt_generate
    from tpusparse.utils.timing import _dispatch_overhead

    S_LO, S_HI = 16, 96

    def per_step_time(gen_fn, *gen_args):
        ts = {}
        for s in (S_LO, S_HI):
            f = jax.jit(functools.partial(gen_fn, steps=s))
            f(*gen_args).block_until_ready()  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0_ = _time2.perf_counter()
                f(*gen_args).block_until_ready()
                best = min(best, _time2.perf_counter() - t0_)
            ts[s] = best - _dispatch_overhead()
        return max(ts[S_HI] - ts[S_LO], 1e-9) / (S_HI - S_LO)

    for b in [int(x) for x in args.batches.split(",")]:
        prompt_b = jnp.asarray(
            rng.integers(0, args.vocab, (b, 16)).astype(np.int32)
        )

        t16 = per_step_time(
            lambda w, ids, steps: gpt_generate(m, w, ids, steps),
            params16, prompt_b,
        )
        tq8 = per_step_time(
            lambda q, ids, steps: q.generate(ids, steps), qm, prompt_b
        )

        kv_bytes_bf16 = 2.0 * args.layers * 2 * b * args.hidden * args.max_position
        kv_bytes_int8 = kv_bytes_bf16 / 2
        rec_all[f"batch{b}"] = {
            "bf16_ms_per_step": t16 * 1e3,
            "int8_ms_per_step": tq8 * 1e3,
            "bf16_tokens_per_s": b / t16,
            "int8_tokens_per_s": b / tq8,
            "int8_speedup": t16 / tq8,
            "traffic_bound_ms_bf16_at_800GBs": (
                (w_bytes_bf16 + kv_bytes_bf16) / 8e11 * 1e3
            ),
            "traffic_bound_ms_int8_at_800GBs": (
                (w_bytes_int8 + kv_bytes_int8) / 8e11 * 1e3
            ),
        }
        log_and_print(logger, json.dumps({f"batch{b}": rec_all[f"batch{b}"]}))

    log_and_print(logger, json.dumps(rec_all))
    # merge into BENCH_DETAILS.json under a stable key
    import os

    details = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAILS.json",
    )
    try:
        with open(details) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    stamp = os.environ.get("TPUSPARSE_BENCH_STAMP", "r5")
    merged[f"{stamp}_gpt_serving"] = rec_all
    with open(details, "w") as f:
        json.dump(merged, f, indent=2)


if __name__ == "__main__":
    main()
