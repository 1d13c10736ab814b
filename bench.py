"""Headline benchmark — run on a real TPU chip by the driver.

Methodology mirrors the reference's own harness, which times its custom
kernel against torch.matmul on the same workload (tests/
cublas_kernel_test.py:11-23 "Our time" vs "PyTorch time"): the tiled
inspector-executor SpMM is timed against XLA's dense matmul performing
the same logical product at matched fp32 precision. Timing uses chained
in-graph iterations with a scalar fetch (tpusparse/utils/timing.py) —
single-call wall-clocking here measures the host↔TPU tunnel (~25 ms), not
the kernel.

Headline workload: block-sparse weights (10% of 128×128 blocks occupied)
at 16384×16384 × dense 16384×512 — the regime the plan executors are
designed for (MXU-sized blocks; the dispatcher picks the resident-B-panel
kernel here, with the ELL DMA-ring as the big-K fallback). The unstructured
ultra-sparse regime (reference tiledspmm test, ~1/n density) and dense
GEMM / BERT-attention sub-metrics land in BENCH_DETAILS.json.

Prints ONE JSON line; vs_baseline = speedup over dense XLA matmul (the
torch.matmul analog).
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import tpusparse as ts
    from tpusparse.ops import _block_exec
    from tpusparse.kernels.tiled_spmm import resident_vmem_bytes
    from tpusparse.plan import build_plan
    from tpusparse.utils.config import get_config

    def _executor_name(plan, b):
        cfg = get_config()
        bn = min(cfg.spmm_block_n, b.shape[-1])
        fits = (
            plan.nblocks >= plan.num_col_blocks
            and resident_vmem_bytes(plan, b.shape[-1], b.dtype.itemsize, bn)
            <= cfg.vmem_limit_bytes
        )
        return "resident" if fits else "tiled"

    from tpusparse.utils.timing import device_time_per_iter

    details = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}

    def norm(y):
        return y / (1.0 + jnp.abs(y).max())

    from tpusparse.dense import matmul as ts_dense_matmul

    def run_pair(a, n, blocksize, key=1, extras=None):
        """Matched-precision comparison: both sides run the framework's
        3-pass bf16 fp32 mode (~1e-6 rel err, the torch fp32 fidelity
        class) — the sparse kernel is never graded against a dense
        baseline running at a different pass count. `extras` (a dict)
        receives the built operands so later sections (int8, bf16 tier)
        reuse them — a second 16384² to_dense + 1 GB tunnel transfer
        costs minutes of bench budget."""
        k = a.shape[1]
        b0 = jax.random.uniform(jax.random.PRNGKey(key), (k, n))
        plan = build_plan(a, blocksize=blocksize)
        bv = plan.pack_values(a.data)
        a_dense = a.to_dense()
        if extras is not None:
            extras.update(plan=plan, bv=bv, a_dense=a_dense, b0=b0)

        def dense_step(x):
            A, b = x
            return A, norm(ts_dense_matmul(A, b))

        def sparse_step(x):
            bv_, b = x
            # the framework's executor dispatch (resident-B when the
            # panel fits VMEM, ELL-ring otherwise) — what spmm_blocks /
            # method='auto' callers actually run
            return bv_, norm(_block_exec(plan, bv_, b))

        # repeats happen inside one compiled program (recompiling the
        # chained loop per round costs more than the measurement itself)
        t_dense = device_time_per_iter(dense_step, (a_dense, b0), repeats=5)
        t_sparse = device_time_per_iter(sparse_step, (bv, b0), repeats=5)
        out = np.asarray(_block_exec(plan, bv, b0))
        ref = np.asarray(
            jnp.matmul(a_dense, b0, precision=jax.lax.Precision.HIGHEST)
        )
        scale = max(np.abs(ref).max(), 1.0)
        rel_err = float(np.abs(out - ref).max() / scale)
        assert rel_err < 5e-3, f"parity failure: rel err {rel_err}"
        return {
            "dense_ms": t_dense * 1e3,
            "sparse_ms": t_sparse * 1e3,
            "speedup": t_dense / t_sparse,
            "nnz": a.nnz,
            "effective_gflops": 2.0 * a.nnz * n / t_sparse / 1e9,
            "nnz_per_s": a.nnz * n / t_sparse,
            "rel_err": rel_err,
            "plan_nblocks": plan.nblocks,
            "plan_ell_width": plan.ell_width,
            "executor": _executor_name(plan, b0),
        }

    def block_sparse_csr(seed, shape, bshape, occupancy):
        """CSR with occupied (bm, bk) blocks, built directly from the
        block mask — materializing the 16384² dense and scanning it
        (CSR.from_dense) costs ~2 min of host time, most of the bench
        budget. Fully vectorized: one bk-wide run per (dense row, block).
        """
        rng = np.random.default_rng(seed)
        m, k = shape
        bm, bk = bshape
        nbr = m // bm
        mask = rng.random((nbr, k // bk)) < occupancy
        brows, bcols = np.nonzero(mask)  # block-row-major (sorted by brow)
        blocks_per_row = mask.sum(axis=1).astype(np.int64)  # (nbr,)
        bstart = np.zeros(nbr + 1, dtype=np.int64)
        np.cumsum(blocks_per_row, out=bstart[1:])
        col_base = (bcols * bk).astype(np.int64)

        # run = one bk-wide column segment of one dense row
        runs_per_dense_row = np.repeat(blocks_per_row, bm)  # (m,)
        total_runs = int(runs_per_dense_row.sum())
        run_row = np.repeat(
            np.arange(m, dtype=np.int64), runs_per_dense_row
        )
        row_first_run = np.cumsum(runs_per_dense_row) - runs_per_dense_row
        pos_in_row = (
            np.arange(total_runs, dtype=np.int64)
            - np.repeat(row_first_run, runs_per_dense_row)
        )
        slot = bstart[run_row // bm] + pos_in_row
        indices = (
            col_base[slot][:, None] + np.arange(bk, dtype=np.int64)[None, :]
        ).reshape(-1)
        indptr = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(runs_per_dense_row * bk, out=indptr[1:])
        nnz = total_runs * bk
        data = rng.random(nnz, dtype=np.float32)
        return ts.CSR(
            data=jnp.asarray(data),
            indices=jnp.asarray(indices.astype(np.int32)),
            indptr=jnp.asarray(indptr.astype(np.int32)),
            shape=shape,
        )

    m = k = 16384

    # ---- headline: block-sparse 10% of 128x128 blocks, n=512 ---------------
    a_head = block_sparse_csr(1, (m, k), (128, 128), 0.10)
    head_ops = {}
    head = run_pair(a_head, 512, (128, 128), extras=head_ops)
    details["block_sparse_10pct"] = head

    # ---- detail: unstructured ultra-sparse (reference tiled-test regime) ---
    # the auto-router sends this fill to the XLA row-gather path (ops.spmm
    # method='auto'); measure what the framework actually dispatches
    from tpusparse.ops import _route_spmm

    a_u = ts.random_csr(0, (m, k), 5e-5)
    b_u = jax.random.uniform(jax.random.PRNGKey(7), (k, 256))
    routed = _route_spmm(a_u, b_u, None)
    a_u_dense = a_u.to_dense()

    def u_dense_step(x):
        A, bb = x
        return A, norm(ts_dense_matmul(A, bb))  # matched 3-pass fp32 mode

    def u_auto_step(x):
        vals, bb = x
        a2 = ts.CSR(
            data=vals, indices=a_u.indices, indptr=a_u.indptr, shape=a_u.shape
        )
        return vals, norm(ts.spmm(a2, bb, method="auto"))

    t_ud = device_time_per_iter(u_dense_step, (a_u_dense, b_u))
    t_ua = device_time_per_iter(u_auto_step, (a_u.data, b_u))
    out_u = np.asarray(ts.spmm(a_u, b_u, method="auto"))
    ref_u = np.asarray(
        jnp.matmul(a_u_dense, b_u, precision=jax.lax.Precision.HIGHEST)
    )
    rel_u = float(np.abs(out_u - ref_u).max() / max(np.abs(ref_u).max(), 1.0))
    assert rel_u < 5e-3, f"unstructured parity failure: {rel_u}"
    details["unstructured_5e-5"] = {
        "dense_ms": t_ud * 1e3,
        "sparse_ms": t_ua * 1e3,
        "speedup": t_ud / t_ua,
        "nnz": a_u.nnz,
        "effective_gflops": 2.0 * a_u.nnz * 256 / t_ua / 1e9,
        "nnz_per_s": a_u.nnz * 256 / t_ua,
        "rel_err": rel_u,
        "routed": routed,
    }

    # ---- detail: dense GEMM kernel TFLOP/s ----------------------------------
    # Per-shape tile winners move with chip tenancy session to session
    # (RESULTS.md r3) — a tile persisted in one session has lost the driver
    # session before (r3: 150 vs 193 XLA TFLOP/s). Revalidate IN THIS
    # session: time the persisted winner plus the shortlist of tiles that
    # have each won at least one recorded session, report the session best,
    # and persist it so the next process starts from this session's truth.
    from tpusparse.kernels.gemm import _tile_key, _tuned_tile, gemm_pallas
    from tpusparse.utils.calibrate import save_gemm_tile

    x0 = jax.random.uniform(jax.random.PRNGKey(2), (4096, 4096), dtype=jnp.bfloat16)

    persisted = _tuned_tile(4096, 4096, 4096, "bfloat16")
    # r5: shortlist trimmed 3 -> 2 (the r5 flash revalidation added two
    # compiles of its own and bench wall time is budget-bound); the two
    # kept tiles are the r3/r4 session winners
    shortlist = [(512, 4096, 512), (2048, 1024, 512)]
    tiles = []
    for t in ([tuple(persisted)] if persisted else []) + shortlist:
        if t not in tiles:
            tiles.append(t)
    tiles = tiles[:2]

    tile_times = {}
    for bm_, bn_, bk_ in tiles:

        def gemm_step(x, bm_=bm_, bn_=bn_, bk_=bk_):
            y = gemm_pallas(x, x, precision="default", out_dtype=jnp.bfloat16,
                            block_m=bm_, block_n=bn_, block_k=bk_)
            return norm(y.astype(jnp.float32)).astype(jnp.bfloat16)

        try:
            tile_times[(bm_, bn_, bk_)] = device_time_per_iter(
                gemm_step, x0, iters_lo=2, iters_hi=6
            )
        except Exception:
            continue  # Mosaic reject under this session's VMEM pressure
    if not tile_times:  # every shortlisted tile rejected this session:
        # fall back to the default-tile path so the bench still completes
        tile_times[(None, None, None)] = device_time_per_iter(
            lambda x: norm(
                gemm_pallas(x, x, precision="default",
                            out_dtype=jnp.bfloat16).astype(jnp.float32)
            ).astype(jnp.bfloat16),
            x0, iters_lo=2, iters_hi=6,
        )
    best_tile = min(tile_times, key=tile_times.get)
    t_gemm = tile_times[best_tile]
    details["gemm_pallas_bf16_4096_tflops"] = 2.0 * 4096**3 / t_gemm / 1e12

    def xla_step(x):
        y = jnp.matmul(x, x)
        return norm(y.astype(jnp.float32)).astype(jnp.bfloat16)

    t_xla = device_time_per_iter(xla_step, x0)
    details["gemm_xla_bf16_4096_tflops"] = 2.0 * 4096**3 / t_xla / 1e12
    details["gemm_tile_revalidation"] = {
        "persisted_tile": list(persisted) if persisted else None,
        "session_tflops": {
            str(list(t)): 2.0 * 4096**3 / tt / 1e12
            for t, tt in tile_times.items()
        },
        "session_best_tile": list(best_tile),
        "vs_xla": t_xla / t_gemm,
    }
    if jax.default_backend() == "tpu" and best_tile[0] is not None:
        save_gemm_tile(_tile_key(4096, 4096, 4096, "bfloat16"), best_tile)

    # ---- detail: BERT-attention layer step time (seq 512, batch 8) ----------
    from tpusparse.models import BertAttentionLayer

    layer = BertAttentionLayer()
    hx = jax.random.normal(jax.random.PRNGKey(4), (8, 512, 768))
    params = layer.init(jax.random.PRNGKey(0), hx)

    def attn_step(x):
        return norm(layer.apply(params, x))

    details["bert_attn_fwd_seq512_ms"] = (
        device_time_per_iter(attn_step, hx, iters_lo=2, iters_hi=10) * 1e3
    )

    # ---- detail: long-seq banded attention (blockwise local vs dense) -------
    from tpusparse.nn import LocalAttention, SelfAttention

    seq = 4096
    xl = jax.random.normal(jax.random.PRNGKey(5), (1, seq, 768))
    loc = LocalAttention(num_heads=12, head_dim=64, window=128)
    dn = SelfAttention(num_heads=12, head_dim=64)
    aparams = loc.init(jax.random.PRNGKey(6), xl)
    t_loc = device_time_per_iter(
        lambda v: norm(loc.apply(aparams, v)), xl, iters_lo=2, iters_hi=6
    )
    t_dn = device_time_per_iter(
        lambda v: norm(dn.apply(aparams, v)), xl, iters_lo=1, iters_hi=3
    )
    details["local_attention_seq4096"] = {
        "local_ms": t_loc * 1e3,
        "dense_ms": t_dn * 1e3,
        "speedup": t_dn / t_loc,
    }

    # ---- detail: fused flash attention at MATCHED precision ----------------
    # the flash kernel runs single-pass bf16 MXU dots, so its dense
    # baseline must too (CLAUDE.md rule: same precision mode both sides);
    # the 3-pass 'high' dense time is recorded separately for context
    from tpusparse.utils.config import set_config

    fl = SelfAttention(num_heads=12, head_dim=64, fused=True)
    set_config(precision="default")
    try:
        # Flash tile revalidation (the GEMM pattern, r4 verdict #2): tuned
        # tiles die with the container, so the driver's row rode (512,512)
        # — 1.26 ms where the r4-tuned (512,2048) measured 0.62. Re-time
        # the default-class tile against the old default IN-SESSION; the
        # winner lands in the in-process tile cache (and calibration.json)
        # before fl.apply resolves its blocks.
        if jax.default_backend() == "tpu":
            from tpusparse.kernels.flash_attention import autotune_flash

            try:
                fl_tile, _fl_t = autotune_flash(
                    seq, 64, 12, dtype=jnp.float32, precision="default",
                    repeats=1, save=True, verbose=False,
                    candidates=[(512, 2048), (512, 512)],
                )
                details["flash_tile_revalidation"] = {
                    "session_best_tile": list(fl_tile),
                    "bare_kernel_ms": _fl_t * 1e3,
                }
            except Exception as e:
                details["flash_tile_revalidation"] = {"error": str(e)[:120]}
        t_fl = device_time_per_iter(
            lambda v: norm(fl.apply(aparams, v)), xl, iters_lo=2, iters_hi=6
        )
        t_dn_bf16 = device_time_per_iter(
            lambda v: norm(dn.apply(aparams, v)), xl, iters_lo=2, iters_hi=6
        )
    finally:
        set_config(precision="high")
    details["flash_attention_seq4096"] = {
        "flash_ms": t_fl * 1e3,
        "dense_bf16_ms": t_dn_bf16 * 1e3,
        "speedup_matched_bf16": t_dn_bf16 / t_fl,
        "dense_3pass_ms": t_dn * 1e3,
        "speedup_vs_3pass": t_dn / t_fl,
    }

    # ---- detail: BigBird block-pattern flash attention at seq 4096 ----------
    # same matched-bf16 protocol as the flash row (its dots are single-pass
    # bf16); local/dense numbers above give the cross-method context
    from tpusparse.nn import BigBirdAttention

    bb = BigBirdAttention(num_heads=12, head_dim=64, block=256,
                          window_blocks=3, num_global_blocks=1,
                          num_random_blocks=2)
    bparams = bb.init(jax.random.PRNGKey(8), xl)
    set_config(precision="default")
    try:
        t_bb = device_time_per_iter(
            lambda v: norm(bb.apply(bparams, v)), xl, iters_lo=2, iters_hi=6
        )
    finally:
        set_config(precision="high")
    details["bigbird_attention_seq4096"] = {
        "bigbird_ms": t_bb * 1e3,
        "local_ms": t_loc * 1e3,
        "dense_bf16_ms": t_dn_bf16 * 1e3,
        "speedup_vs_dense_bf16": t_dn_bf16 / t_bb,
        "vs_local": t_loc / t_bb,
    }

    # ---- detail: int8 serving path on the headline operands -----------------
    from tpusparse.kernels.tiled_spmm import resident_spmm_int8_pallas
    from tpusparse.quant import quantize_block_values, quantize_columns

    plan_h, b_h = head_ops["plan"], head_ops["b0"]
    qv, sc = quantize_block_values(head_ops["bv"])
    qb, tb = quantize_columns(b_h)
    qb, tb = jax.device_put(np.asarray(qb)), jax.device_put(np.asarray(tb))

    def int8_step(x):
        dep = (x[0, 0] * 0).astype(jnp.int8)
        y = resident_spmm_int8_pallas(plan_h, qv, sc, qb + dep, tb)
        return y / (1.0 + jnp.abs(y).max())

    t_i8 = device_time_per_iter(int8_step, b_h)
    details["int8_resident_headline"] = {
        "int8_ms": t_i8 * 1e3,
        "fp32_resident_ms": head["sparse_ms"],
        "speedup_vs_fp32_resident": head["sparse_ms"] / (t_i8 * 1e3),
        "effective_tflops": 2.0 * a_head.nnz * 512 / t_i8 / 1e12,
    }

    # ---- detail: bf16 training tier on the headline operands ----------------
    # precision='default' = single-pass bf16 MXU dots (standard TPU training
    # numerics); matched bf16 dense baseline. Completes the tier table:
    # fp32-class (3-pass) / bf16 training / int8 serving.
    from tpusparse.utils.config import set_config as _set_config

    bv_h = head_ops["bv"]

    def bf16_sparse_step(x):
        bv_, bb = x
        return bv_, norm(_block_exec(plan_h, bv_, bb))

    def bf16_dense_step(x):
        A, bb = x
        return A, norm(ts_dense_matmul(A, bb))

    a_head_dense = head_ops["a_dense"]
    _set_config(precision="default")
    try:
        t_s16 = device_time_per_iter(bf16_sparse_step, (bv_h, b_h), repeats=5)
        t_d16 = device_time_per_iter(bf16_dense_step, (a_head_dense, b_h))
        out16 = np.asarray(_block_exec(plan_h, bv_h, b_h))
    finally:
        _set_config(precision="high")
    ref16 = np.asarray(
        jnp.matmul(a_head_dense, b_h, precision=jax.lax.Precision.HIGHEST)
    )
    rel16 = float(
        np.abs(out16 - ref16).max() / max(np.abs(ref16).max(), 1.0)
    )
    assert 2e-5 < rel16 < 3e-2, (
        f"bf16 tier fidelity {rel16}: <2e-5 means the precision switch "
        "didn't reach the kernel (stale jit cache, 3-pass is <5e-6 here), "
        ">3e-2 means broken"
    )
    details["bf16_tier_headline"] = {
        "sparse_ms": t_s16 * 1e3,
        "dense_bf16_ms": t_d16 * 1e3,
        "speedup": t_d16 / t_s16,
        "vs_fp32_3pass_sparse": head["sparse_ms"] / (t_s16 * 1e3),
        "effective_gflops": 2.0 * a_head.nnz * 512 / t_s16 / 1e9,
        "rel_err": rel16,
    }

    # ---- detail: batched sparse (reference 4-D BERT shape, r3 fold) ---------
    # A (512, 512) @ 10% (the reference cusparse density) x B (256·16, 512,
    # 64) — the reference's naive-kernel batched workload
    # (tests/naive_kernel_test.py:66-68). r3 folds batch into the executor's
    # n-grid (ONE launch, the reference's matmuls.py:282-288 flatten). r4:
    # the row is judged the way everything else is — against the
    # matched-precision dense batched matmul, with the router's own choice
    # at folded width recorded, and a traffic-bound roofline. At 10%
    # UNSTRUCTURED density dense is expected to win (the router knows it);
    # the fold's win case is the block-sparse batched row that follows.
    from tpusparse.plan import _ROOFLINE

    hbm_bw = _ROOFLINE["hbm_bandwidth"]
    a_bert = ts.random_csr(11, (512, 512), 0.10)
    b4 = jax.random.uniform(jax.random.PRNGKey(12), (4096, 512, 64))
    a_bert_dense = a_bert.to_dense()

    def bert_fold_step(x):
        y = ts.spmm(a_bert, x, method="tiled")
        return y / (1.0 + jnp.abs(y).max())

    def bert_dense_step(x):
        y = ts_dense_matmul(a_bert_dense, x)  # matched 3-pass fp32 mode
        return y / (1.0 + jnp.abs(y).max())

    t_fold = device_time_per_iter(bert_fold_step, b4, iters_lo=2, iters_hi=6)
    t_bdense = device_time_per_iter(bert_dense_step, b4, iters_lo=2, iters_hi=6)
    routed_bert = _route_spmm(a_bert, b4, None)
    # min traffic for ANY executor of this product: stream B in + C out once
    bound_bert = 2.0 * b4.size * 4 / hbm_bw
    details["batched_spmm_bert4d"] = {
        "batch": 4096,
        "fold_ms": t_fold * 1e3,
        "dense_ms": t_bdense * 1e3,
        "dense_over_fold": t_bdense / t_fold,
        "routed_method": routed_bert,
        "traffic_bound_ms": bound_bert * 1e3,
        # the replaced lax.map path measured 20.8 ms same-session when the
        # fold landed (2.1x, RESULTS.md r3); compiling a 4096-length scan
        # every round just to re-time the old path blew the bench budget
        "lax_map_ms_r3_record": 20.81,
    }

    # ---- detail: batched sparse, block-sparse pattern (the fold's win case) -
    # A (2048, 2048) with 10% of 128² blocks x B (32, 2048, 512). r5: the
    # batch rides the GRID of the batched resident executor (whole vals
    # array VMEM-resident, no fold transposes — ops._batched_resident_ok);
    # same matched 3-pass protocol; the roofline is the same B+C stream
    # bound. Remaining gap to the bound is 3-pass slot issue (the bf16
    # tier of the same kernel measured 2.96x vs fp32's 3.9x in-session).
    a_bb = block_sparse_csr(21, (2048, 2048), (128, 128), 0.10)
    b3 = jax.random.uniform(jax.random.PRNGKey(22), (32, 2048, 512))
    a_bb_dense = a_bb.to_dense()

    def bb_fold_step(x):
        y = ts.spmm(a_bb, x, method="tiled")
        return y / (1.0 + jnp.abs(y).max())

    def bb_dense_step(x):
        y = ts_dense_matmul(a_bb_dense, x)
        return y / (1.0 + jnp.abs(y).max())

    t_bbfold = device_time_per_iter(bb_fold_step, b3, iters_lo=2, iters_hi=6)
    t_bbdense = device_time_per_iter(bb_dense_step, b3, iters_lo=2, iters_hi=6)
    out_bb = np.asarray(ts.spmm(a_bb, b3, method="tiled"))
    ref_bb = np.asarray(
        jnp.matmul(a_bb_dense, b3, precision=jax.lax.Precision.HIGHEST)
    )
    rel_bb = float(
        np.abs(out_bb - ref_bb).max() / max(np.abs(ref_bb).max(), 1.0)
    )
    assert rel_bb < 5e-3, f"batched block-sparse parity failure: {rel_bb}"
    bound_bb = 2.0 * b3.size * 4 / hbm_bw
    from tpusparse.ops import _batched_resident_ok
    from tpusparse.plan import build_plan as _bp

    details["batched_spmm_blocksparse"] = {
        "batch": 32,
        "executor": (
            "batched_resident"
            if _batched_resident_ok(_bp(a_bb), b3)
            else "folded"
        ),
        "fold_ms": t_bbfold * 1e3,
        "dense_ms": t_bbdense * 1e3,
        "speedup": t_bbdense / t_bbfold,
        "routed_method": _route_spmm(a_bb, b3, None),
        "traffic_bound_ms": bound_bb * 1e3,
        "fold_vs_bound": t_bbfold / bound_bb,
        "rel_err": rel_bb,
    }

    # merge-preserve: other benchmarks (AMG, DIA, ...) record their own
    # keys in this file; only overwrite the keys this run produced
    try:
        with open("BENCH_DETAILS.json") as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    merged.update(details)
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(merged, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "block_sparse_tiled_spmm_effective_throughput",
                "value": round(head["effective_gflops"], 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(head["speedup"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
