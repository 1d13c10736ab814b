"""Flash-attention roofline audit + block autotune (r4 verdict task 1).

Separates where the long-seq forward's time goes — MXU dots, the exp
pass, the remaining VPU softmax plumbing, pipeline — by timing stripped
kernel variants that share the exact grid/BlockSpec scaffolding of the
real kernel (kernels/flash_attention.py):

  mxu_only : two dots + accumulate, no softmax          -> MXU+pipe floor
  noexp    : full online softmax, exp replaced by a sub -> exp = full-noexp
  full     : the production kernel

then sweeps block_q/block_k through `autotune_flash` (persisted to
calibration.json, picked up automatically by later flash_attention
calls) and parity-checks the winner against the dense reference at the
tier's honest tolerance.

The reference has no attention kernels (its README.md:61-80 recipe swaps
two matmuls by hand); this audits the fused replacement against the
hardware bound the way every SpMM executor in this repo is audited.

Long TPU run — launch under nohup and poll (CLAUDE.md tunnel note).
Usage: python benchmarks/flash_roofline.py [--seqs 4096,8192] [--autotune]
"""

import functools
import json

import numpy as np

from common import base_parser, get_logger, log_and_print, setup_platform


def _variant_time(q, k, v, bq, bk, mode: str) -> float:
    """Time one stripped-kernel variant (seconds/call). q pre-scaled."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpusparse.kernels import mxu
    from tpusparse.utils.config import get_config
    from tpusparse.utils.timing import device_time_per_iter

    bh, sp, dp = q.shape
    prec = jax.lax.Precision.DEFAULT

    def body(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        ki = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ki == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, -1e30)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        s = mxu.dot_nt(q_ref[0], k_ref[0], prec)
        if mode == "mxu_only":
            acc_scr[:] += mxu.dot(s.astype(v_ref.dtype), v_ref[0], prec)
        else:  # noexp: every softmax pass except the exp itself
            m_prev = m_scr[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = s - m_new  # the exp stand-in: same element count, 1 op
            corr = jnp.exp(m_prev - m_new)
            l_scr[:, :1] = corr * l_scr[:, :1] + jnp.sum(
                p, axis=1, keepdims=True
            )
            acc_scr[:] = acc_scr[:] * corr + mxu.dot(
                p.astype(v_ref.dtype), v_ref[0], prec
            )
            m_scr[:, :1] = m_new

        @pl.when(ki == nk - 1)
        def _():
            l = l_scr[:, :1]
            o_ref[0] = (acc_scr[:] / jnp.where(l == 0.0, 1.0, l)).astype(
                o_ref.dtype
            )

    grid = (bh, sp // bq, sp // bk)
    call = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, dp), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sp, dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=get_config().vmem_limit_bytes,
        ),
    )

    def step(x):
        y = call(x, k, v)
        return (x * (1.0 + 0.0 * jnp.abs(y).max())).astype(x.dtype)

    return device_time_per_iter(step, q, iters_lo=2, iters_hi=6)


def main():
    ap = base_parser("flash-attention roofline audit")
    ap.add_argument("--seqs", default="4096,8192")
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--autotune", action="store_true",
                    help="sweep+persist block_q/block_k per seq")
    args = ap.parse_args()
    setup_platform(cpu=args.cpu)

    import jax
    import jax.numpy as jnp

    from tpusparse.kernels.flash_attention import (
        _reference_attention, autotune_flash, flash_attention)
    from tpusparse.utils.timing import device_time_per_iter

    logger = get_logger("flash_roofline", "flash_roofline.log")
    h, hd = args.heads, args.head_dim
    bh = h  # batch 1 x heads, flattened — matches the longcontext harness

    # the repo's sustained MXU rate on this chip class (RESULTS.md r3:
    # Pallas GEMM 150-190 TF, XLA 170-210); used only to annotate the
    # floor, the measured mxu_only row is the real bound
    for seq in [int(s) for s in args.seqs.split(",")]:
        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(
            rng.standard_normal((bh, seq, hd)).astype(np.float32)
        )
        q, k, v = mk(), mk(), mk()
        dp = 128  # head_dim pads to 128 lanes in-kernel
        qs = (q * (1.0 / np.sqrt(hd))).astype(jnp.bfloat16)
        kb, vb = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        pad = ((0, 0), (0, 0), (0, dp - hd))
        q3, k3, v3 = (jnp.pad(x, pad) for x in (qs, kb, vb))

        rec = {"seq": seq, "heads": h, "head_dim": hd,
               "useful_gflop": 4.0 * bh * seq * seq * hd / 1e9,
               "padded_gflop": 4.0 * bh * seq * seq * dp / 1e9}

        # stripped variants at the default (512, 512) blocks
        rec["mxu_only_512_ms"] = _variant_time(q3, k3, v3, 512, 512,
                                               "mxu_only") * 1e3
        rec["noexp_512_ms"] = _variant_time(q3, k3, v3, 512, 512,
                                            "noexp") * 1e3

        # the production kernel, default tier
        def full_step(x, bq=512, bk=512):
            y = flash_attention(x, k, v, block_q=bq, block_k=bk,
                                precision="default")
            return x * (1.0 + 0.0 * jnp.abs(y).max())

        rec["full_512_ms"] = device_time_per_iter(
            full_step, q, iters_lo=2, iters_hi=6
        ) * 1e3
        rec["exp_cost_ms"] = rec["full_512_ms"] - rec["noexp_512_ms"]
        rec["softmax_overhead_ms"] = rec["noexp_512_ms"] - rec["mxu_only_512_ms"]
        rec["mxu_eff_tflops_padded"] = (
            rec["padded_gflop"] / rec["mxu_only_512_ms"]
        )

        if args.autotune:
            (bq, bk), t_best = autotune_flash(
                seq, hd, bh, precision="default", verbose=True
            )
            rec["tuned_block"] = [bq, bk]
            rec["tuned_ms"] = t_best * 1e3
            rec["tuned_vs_512"] = rec["full_512_ms"] / rec["tuned_ms"]

        # parity: tuned/default kernel vs dense reference at bf16-tier tol
        out = np.asarray(flash_attention(q, k, v, precision="default"))
        ref = np.asarray(
            _reference_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), False, 1.0 / np.sqrt(hd),
            )
        )
        rec["rel_err"] = float(
            np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
        )
        assert rec["rel_err"] < 5e-2, rec
        log_and_print(logger, json.dumps(rec))


if __name__ == "__main__":
    main()
