"""Multi-device SpMM scaling harness — nnz/s and efficiency at 1..N devices.

BASELINE configs[4] workload (the reference is single-GPU with no
distributed layer — reference sparse_mm.cu:295 pins cudaSetDevice(0);
this capability is new here): row-partition a block-sparse A over a
device mesh, replicate or ring-cycle B, and measure SpMM throughput
(nnz·n_cols/s) at 1, 2, 4, ... devices, reporting scaling efficiency
relative to the 1-device rate (target ≥ 80%).

With one real TPU chip available, the default is a virtual 8-device CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count) — the standard
fake-multi-device mechanism; the same code runs unmodified on a real
slice, where collectives ride ICI.

Usage: python benchmarks/scaling_benchmark.py [--devices 8] [--mode row|halo]
"""

from __future__ import annotations

import json
import sys

from common import artifact_path, base_parser, get_logger, log_and_print, setup_platform


def bench_ndev(a, n_cols, ndev, mode, seed):
    import jax
    import jax.numpy as jnp

    from tpusparse.parallel.mesh import make_mesh
    from tpusparse.parallel.spmm import (
        halo_spmm,
        shard_plan_2d,
        shard_plan_rows,
        sharded_spmm,
    )
    from tpusparse.utils.timing import device_time_per_iter, normalizing

    mesh = make_mesh((ndev,), ("model",), devices=jax.devices()[:ndev])
    k = a.shape[1]
    b = jax.random.uniform(jax.random.PRNGKey(seed), (k, n_cols))

    if mode == "halo":
        plan = shard_plan_2d(a, ndev)
        run = lambda d, bb: halo_spmm(plan, d, bb, mesh)
    else:
        plan = shard_plan_rows(a, ndev)
        run = lambda d, bb: sharded_spmm(plan, d, bb, mesh)

    def step(x):
        d, bb = x
        return d, normalizing(lambda v: run(d, v))(bb)

    t = device_time_per_iter(step, (a.data, b), iters_lo=2, iters_hi=8)
    return a.nnz * n_cols / t, t


def main():
    p = base_parser("multi-device SpMM scaling (nnz/s)")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--mode", choices=("row", "halo"), default="row")
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--n-cols", type=int, default=256)
    p.add_argument(
        "--mtx",
        default=None,
        help="real matrix: a .mtx[.gz] path, a basename resolved in "
        "$TPUSPARSE_MATRIX_DIR, or a tpusparse.utils.matrices catalog "
        "name (e.g. powerlaw_100k, laplace2d_1024, circuit_50k)",
    )
    p.add_argument(
        "--real",
        action="store_true",
        help="use real devices (default: virtual CPU mesh, since this "
        "environment exposes one TPU chip)",
    )
    args = p.parse_args()

    jax = setup_platform(n_devices=None if args.real else args.devices)
    if args.real and jax.device_count() < args.devices:
        print(
            f"only {jax.device_count()} real devices; drop --real for a "
            "virtual CPU mesh",
            file=sys.stderr,
        )
        raise SystemExit(1)

    logger = get_logger("scaling", "scaling_benchmark.log")

    import numpy as np

    import tpusparse as ts

    if args.mtx:
        from tpusparse.utils.matrices import get_matrix

        a = get_matrix(args.mtx)
        log_and_print(
            logger,
            f"A = {args.mtx}: {a.shape[0]}x{a.shape[1]}, nnz {a.nnz}, "
            f"B {a.shape[1]}x{args.n_cols}, mode {args.mode}, "
            f"backend {jax.default_backend()}",
        )
    else:
        dim = args.dim or (8192 if args.full else 1024)
        bm = bk = 128 if dim >= 1024 else 32
        rng = np.random.default_rng(args.seed)
        mask = rng.random((dim // bm, dim // bk)) < 0.1
        a = ts.CSR.from_dense(
            rng.random((dim, dim), dtype=np.float32)
            * np.kron(mask, np.ones((bm, bk), np.float32))
        )
        log_and_print(
            logger,
            f"A {dim}x{dim}, nnz {a.nnz} (10% of {bm}x{bk} blocks), "
            f"B {dim}x{args.n_cols}, mode {args.mode}, backend {jax.default_backend()}",
        )

    if jax.default_backend() == "cpu":
        log_and_print(
            logger,
            "note: virtual CPU devices share one host's cores — absolute "
            "nnz/s will not rise with ndev here; this mode validates the "
            "sharded path and measures collective overhead. Run with --real "
            "on a multi-chip slice for true scaling efficiency.",
        )

    ndevs = [d for d in (1, 2, 4, 8, 16) if d <= args.devices]
    base_rate = None
    results = []
    for ndev in ndevs:
        rate, t = bench_ndev(a, args.n_cols, ndev, args.mode, args.seed)
        base_rate = base_rate or rate
        eff = rate / (base_rate * ndev)
        results.append({"ndev": ndev, "nnz_per_s": rate, "sec_per_iter": t,
                        "efficiency": eff})
        log_and_print(
            logger,
            f"ndev {ndev}: {rate / 1e9:.2f} Gnnz·col/s "
            f"({t * 1e3:.3f} ms/iter), efficiency {eff:.1%}",
        )
    with open(artifact_path("scaling_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
