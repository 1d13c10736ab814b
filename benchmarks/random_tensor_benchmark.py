"""Dimension × sparsity timing sweep — dense XLA vs naive vs tiled SpMM.

TPU-native analog of the reference's random-tensor sweep (reference
benchmarks/random_tensor_benchmark.py:70-91: dims {1024,4096,8192,12288,
16384}², sparsity {0,.25,.5,.75,.9,.99}, torch vs cuBLAS vs cuSPARSE,
logged to random_tensor_benchmark.log). Here the contenders are XLA's
dense matmul (the torch.matmul analog), the naive ELL gather SpMM, and
the tiled inspector-executor SpMM; timing uses the chained-iteration
device timer rather than host wall-clock around one call.

Two sparsity regimes per cell: unstructured (uniform-random nnz, the
reference's regime) and block-structured (occupied MXU-sized blocks,
the regime the tiled executor targets).

Usage: python benchmarks/random_tensor_benchmark.py [--full] [--n-cols 256]
"""

from __future__ import annotations

import json
import os

from common import base_parser, get_logger, log_and_print, setup_platform


def time_contenders(dim, n_cols, sparsity, structured, seed):
    # small per-measure iteration counts: each device_time_per_iter call
    # recompiles its chained loop, and compile time dominates at small dims
    TIMER = dict(iters_lo=1, iters_hi=4, repeats=2, min_delta=4e-3)
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpusparse as ts
    from tpusparse.kernels.tiled_spmm import tiled_spmm_pallas
    from tpusparse.plan import build_plan
    from tpusparse.utils.timing import device_time_per_iter, normalizing

    density = 1.0 - sparsity
    if structured:
        bm = bk = min(128, dim)
        rng = np.random.default_rng(seed)
        mask = rng.random((dim // bm, dim // bk)) < density
        dense_np = rng.random((dim, dim), dtype=np.float32) * np.kron(
            mask, np.ones((bm, bk), np.float32)
        )
        a = ts.CSR.from_dense(dense_np)
        blocksize = (bm, bk)
    else:
        a = ts.random_csr(seed, (dim, dim), max(density, 1.0 / dim))
        blocksize = None
    b = jax.random.uniform(jax.random.PRNGKey(seed + 1), (dim, n_cols))
    a_dense = a.to_dense()

    from tpusparse.ops import _route_spmm

    results = {"dim": dim, "sparsity": sparsity, "structured": structured,
               "nnz": int(a.nnz), "routed": _route_spmm(a, b, blocksize)}

    def dense_step(x):
        A, bb = x
        # framework dense op: same 3-pass fp32 mode as the sparse side
        return A, normalizing(lambda v: ts.matmul(A, v))(bb)

    results["dense_ms"] = device_time_per_iter(dense_step, (a_dense, b), **TIMER) * 1e3

    # the framework's own dispatch (what a user gets)
    def auto_step(x):
        vals, bb = x
        a2 = ts.CSR(data=vals, indices=a.indices, indptr=a.indptr, shape=a.shape)
        return vals, normalizing(lambda v: ts.spmm(a2, v, blocksize=blocksize))(bb)

    results["auto_ms"] = device_time_per_iter(auto_step, (a.data, b), **TIMER) * 1e3
    results["auto_nnz_per_s"] = a.nnz * n_cols / (results["auto_ms"] / 1e3)

    # explicit tiled executor where its scalar-prefetch arrays fit SMEM
    plan = build_plan(a, blocksize=blocksize)
    if plan.num_row_blocks * plan.ell_width * 4 < 900_000:
        bv = plan.pack_values(a.data)

        def tiled_step(x):
            vals, bb = x
            return vals, normalizing(lambda v: tiled_spmm_pallas(plan, vals, v))(bb)

        results["tiled_ms"] = device_time_per_iter(tiled_step, (bv, b), **TIMER) * 1e3

    # naive gather kernel only where its prefetched ELL arrays fit SMEM
    from tpusparse.ops import resolve_ell_width

    if (2 * dim * resolve_ell_width(a) + dim) * 4 <= 900_000:
        def naive_step(x):
            av, bb = x
            a2 = ts.CSR(data=av, indices=a.indices, indptr=a.indptr, shape=a.shape)
            return av, normalizing(lambda v: ts.naive_spmm(a2, v))(bb)

        results["naive_ms"] = device_time_per_iter(naive_step, (a.data, b), **TIMER) * 1e3
    return results


def main():
    p = base_parser("dim × sparsity SpMM sweep")
    p.add_argument("--n-cols", type=int, default=256)
    p.add_argument(
        "--mtx", nargs="*", default=None,
        help="run on real matrices instead of the synthetic grid "
        "(delegates to realmatrix_benchmark; accepts .mtx[.gz] paths or "
        "tpusparse.utils.matrices catalog names)",
    )
    args = p.parse_args()
    if args.mtx is not None:
        import realmatrix_benchmark
        import sys

        sys.argv = [sys.argv[0]] + (["--mtx"] + args.mtx if args.mtx else []) \
            + (["--full"] if args.full else []) \
            + (["--cpu"] if args.cpu else []) \
            + ["--n-cols", str(args.n_cols), "--seed", str(args.seed)]
        return realmatrix_benchmark.main()
    here = os.path.dirname(os.path.abspath(__file__))
    logger = get_logger("sweep", os.path.join(here, "random_tensor_benchmark.log"))
    setup_platform(cpu=args.cpu)

    if args.full:
        dims = [1024, 4096, 8192, 12288, 16384]
        sparsities = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99]
    else:
        dims = [512, 1024]
        sparsities = [0.5, 0.9, 0.99]

    all_results = []
    for structured in (False, True):
        for sparsity in sparsities:
            for dim in dims:
                r = time_contenders(dim, args.n_cols, sparsity, structured, args.seed)
                all_results.append(r)
                best = min(
                    (v, k) for k, v in r.items() if k.endswith("_ms")
                )
                log_and_print(
                    logger,
                    f"dim {dim} sparsity {sparsity} "
                    f"{'block' if structured else 'unstructured'} "
                    f"routed={r['routed']}: "
                    + " ".join(
                        f"{k}={v:.3f}" for k, v in r.items() if k.endswith("_ms")
                    )
                    + f"  winner={best[1][:-3]}",
                )
    with open(os.path.join(here, "random_tensor_results.json"), "w") as f:
        json.dump(all_results, f, indent=2)
    log_and_print(logger, f"wrote {len(all_results)} cells to benchmarks/random_tensor_results.json")


if __name__ == "__main__":
    main()
