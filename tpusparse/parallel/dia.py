"""Sharded banded (DIA) matvec: the classic stencil halo exchange.

No reference analog (single GPU, SURVEY.md §2.5). A banded operator
row-partitioned over the mesh needs only each neighbor's boundary strip
of x — at most `bandwidth` rows — so the communication is two
`lax.ppermute` strip exchanges riding ICI, overlapped by XLA with the
per-diagonal multiply-adds. Devices at the chain ends receive ZERO
strips from ppermute (no wrap-around pairs), which is exactly the
structural-zero boundary semantics of `ops.dia_spmm`'s padding.

Unlike the CSR row-sharded matvec (parallel/linalg.py — B replicated,
one all-gather per product), x here stays SHARDED the whole time:
per-device traffic is O(bandwidth · k), independent of n, the
communication pattern that makes banded operators scale.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpusparse.parallel.mesh import shard_map
from tpusparse.types import DIA

__all__ = ["make_sharded_dia_matvec", "sharded_dia_cg"]


def make_sharded_dia_matvec(
    a: DIA, mesh: Mesh, axis: str = "model"
) -> Callable:
    """v ↦ A·v with A and v both row-partitioned over `axis`.

    Accepts/returns GLOBAL arrays ((n,) or (n, k)); under jit the
    shardings propagate so v never re-replicates between Krylov
    iterations. Requires square A with bandwidth ≤ rows-per-device
    (one-neighbor halo)."""
    m, k = a.shape
    if m != k:
        raise ValueError(f"sharded dia matvec needs square A, got {a.shape}")
    ndev = int(mesh.shape[axis])
    rpd = -(-m // ndev)
    n_pad = rpd * ndev
    offsets = a.offsets
    lo = int(max(0, -offsets.min(initial=0)))
    hi = int(max(0, offsets.max(initial=0)))
    if max(lo, hi) > rpd:
        raise ValueError(
            f"bandwidth {max(lo, hi)} exceeds rows-per-device {rpd}; "
            "use fewer devices or the CSR row-sharded matvec"
        )
    # device-major slabs of the diagonal data, zero-padded rows
    data = jnp.pad(a.data, ((0, 0), (0, n_pad - m)))
    data = data.reshape(a.noffsets, ndev, rpd).transpose(1, 0, 2)
    fwd = [(i, i + 1) for i in range(ndev - 1)]  # unpaired ends get zeros
    bwd = [(i + 1, i) for i in range(ndev - 1)]

    def body(data_l, x_l):
        xl = x_l[0]  # (rpd, k)
        dl = data_l[0]  # (noff, rpd)
        if lo:
            left = lax.ppermute(xl[rpd - lo :], axis, fwd)
        if hi:
            right = lax.ppermute(xl[:hi], axis, bwd)
        parts = ([left] if lo else []) + [xl] + ([right] if hi else [])
        xp = jnp.concatenate(parts, axis=0)
        acc = jnp.zeros_like(xl)
        for d, off in enumerate(offsets):
            seg = lax.dynamic_slice_in_dim(xp, lo + int(off), rpd, axis=0)
            acc = acc + dl[d][:, None] * seg
        return acc[None]

    sharded = shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis)
    )

    def mv(v: jnp.ndarray) -> jnp.ndarray:
        vv = v if v.ndim == 2 else v[:, None]
        if vv.shape[0] != m:
            raise ValueError(f"matvec expects length-{m} vectors, got {v.shape}")
        vp = jnp.pad(vv, ((0, n_pad - m), (0, 0)))
        out = sharded(data, vp.reshape(ndev, rpd, vv.shape[1]))
        out = out.reshape(n_pad, vv.shape[1])[:m]
        return out if v.ndim == 2 else out[:, 0]

    return mv


def sharded_dia_cg(
    a: DIA,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "model",
    x0=None,
    tol: float = 1e-5,
    atol: float = 0.0,
    maxiter=None,
    M=None,
):
    """Conjugate gradient for SPD banded A with the halo-exchange matvec
    sharded over the mesh. Returns (x, info) like `linalg.cg`."""
    mv = make_sharded_dia_matvec(a, mesh, axis)
    return jax.scipy.sparse.linalg.cg(
        mv, b, x0=x0, tol=tol, atol=atol, maxiter=maxiter, M=M
    )
