"""Distributed iterative solvers: Krylov iterations over a row-sharded
matvec.

The multi-device solver story the reference cannot have (single GPU,
SURVEY.md §2.5), composed from the framework's own pieces: the operator
is row-partitioned once with `parallel.spmm.shard_plan_rows`, each CG
iteration's matvec runs the local tiled executor inside `shard_map`
(`sharded_spmm` recipe — B replicated, zero forward communication), and
XLA re-replicates the sharded product for the next iteration's vector
algebra (one all-gather per matvec riding ICI). The Krylov loop itself
stays `jax.scipy.sparse.linalg` — dots/axpys are replicated elementwise
work, so the whole solve jits to one SPMD program.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tpusparse.parallel.spmm import RowShardedPlan, shard_plan_rows, sharded_spmm
from tpusparse.types import CSR

__all__ = ["make_sharded_matvec", "sharded_cg", "sharded_power_iteration"]


def make_sharded_matvec(
    rsp: RowShardedPlan,
    data: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
) -> Callable:
    """v ↦ A·v with A row-partitioned over `axis`, v replicated.

    Values are packed into the per-device slot buffers ONCE at closure
    build (the plan analog of inspect-once/multiply-many); accepts (n,)
    or (n, k). Square A only (the Krylov use case)."""
    m, k = rsp.shape
    if m != k:
        raise ValueError(f"sharded matvec needs square A, got {rsp.shape}")
    blocks = rsp.pack_values(data)  # pack ONCE; every call reuses it

    def mv(v: jnp.ndarray) -> jnp.ndarray:
        vv = v if v.ndim == 2 else v[:, None]
        if vv.shape[0] != k:
            raise ValueError(f"matvec expects length-{k} vectors, got {v.shape}")
        out = sharded_spmm(rsp, data, vv, mesh, axis, packed=blocks)
        return out if v.ndim == 2 else out[:, 0]

    return mv


def sharded_cg(
    a: CSR,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "model",
    blocksize: Optional[Tuple[int, int]] = None,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-5,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable] = None,
):
    """Conjugate gradient for SPD A with the matvec sharded over the
    mesh. Returns (x, info) like `linalg.cg`; `M` (if given) must be a
    replicated-apply preconditioner (e.g. `jacobi_preconditioner`)."""
    ndev = int(np.prod([mesh.shape[ax] for ax in (axis,)]))
    rsp = shard_plan_rows(a, ndev, blocksize=blocksize)
    mv = make_sharded_matvec(rsp, a.data, mesh, axis)
    return jax.scipy.sparse.linalg.cg(
        mv, b, x0=x0, tol=tol, atol=atol, maxiter=maxiter, M=M
    )


def sharded_power_iteration(
    a: CSR,
    mesh: Mesh,
    *,
    axis: str = "model",
    blocksize: Optional[Tuple[int, int]] = None,
    iters: int = 100,
    seed: int = 0,
):
    """Dominant eigenpair with the matvec sharded over the mesh.
    Returns (eigenvalue, unit eigenvector), like `linalg.power_iteration`."""
    ndev = int(np.prod([mesh.shape[ax] for ax in (axis,)]))
    rsp = shard_plan_rows(a, ndev, blocksize=blocksize)
    mv = make_sharded_matvec(rsp, a.data, mesh, axis)
    n = a.shape[0]
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n,))
    v0 = v0 / jnp.linalg.norm(v0)

    def body(_, v):
        w = mv(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v0)
    lam = jnp.vdot(v, mv(v))
    return lam, v
