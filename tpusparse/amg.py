"""Algebraic multigrid (smoothed aggregation) preconditioner.

No reference analog (the reference stops at the matmul layer,
SURVEY.md §2.1) — this is the capstone consumer of the framework's own
primitives: the setup phase builds the whole grid hierarchy with
`spgemm` (Galerkin triple product Pᵀ·A·P), `sp_sub`/`sp_scale`
(prolongator smoothing) and `ops.transpose_csr`, and the apply phase is
nothing but plan-cached `ops.spmm` matvecs + a dense coarse solve — so
every V-cycle runs as one jittable XLA program on TPU.

Architecture follows the framework's plan/executor split: setup is a
host-side pass over CONCRETE values (like `linalg.ilu0` or plan
building — aggregation, strength-of-connection and the spectral-radius
estimate need real numbers), the returned preconditioner closes over
trace-time-constant patterns and is jit/vmap-compatible in the vector.

Standard smoothed-aggregation construction (Vaněk/Mandel/Brezina):
strength graph  S_ij = |a_ij| ≥ θ·√(a_ii·a_jj); greedy aggregation
(root nodes + neighbor attachment); tentative piecewise-constant
prolongator with unit columns; one damped-Jacobi smoothing step
P = (I − ω D⁻¹A) P_t with ω = 4/3·ρ(D⁻¹A)⁻¹.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse import ops
from tpusparse.elementwise import sp_scale, sp_sub
from tpusparse.linalg import Operator, _as_csr
from tpusparse.spgemm import spgemm
from tpusparse.types import CSR

__all__ = ["AMGPreconditioner", "smoothed_aggregation_setup", "amg_preconditioner"]

_INT = np.int32


def _strength_graph(indptr, indices, vals, theta: float):
    """Boolean keep-mask over stored entries: strong off-diagonal
    connections |a_ij| >= theta * sqrt(|a_ii a_jj|) (plus the diagonal,
    which aggregation treats separately)."""
    n = indptr.shape[0] - 1
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    diag = np.zeros(n, np.float64)
    on_diag = rows == indices
    diag[rows[on_diag]] = np.abs(vals[on_diag])
    scale = np.sqrt(np.maximum(diag[rows] * diag[indices], 1e-300))
    strong = (np.abs(vals) >= theta * scale) & ~on_diag
    return rows, strong


def _aggregate(indptr, indices, rows, strong, n: int):
    """Greedy aggregation over the strength graph.

    Pass 1: any node with no aggregated strong neighbor becomes a root
    and absorbs its strong neighborhood. Pass 2: remaining nodes join
    the aggregate of their first aggregated strong neighbor. Pass 3:
    leftovers become singletons. Returns (agg (n,) int64, n_agg).

    Routed to the native C++ pass (csrc ts_aggregate, bitwise-identical)
    when the runtime is available; this Python loop is the fallback.
    """
    from tpusparse.runtime import native

    if native.available():
        return native.aggregate(indptr, indices, strong)
    agg = np.full(n, -1, np.int64)
    n_agg = 0
    for i in range(n):
        if agg[i] != -1:
            continue
        sl = slice(indptr[i], indptr[i + 1])
        nbrs = indices[sl][strong[sl]]
        if (agg[nbrs] != -1).any():
            continue
        agg[i] = n_agg
        agg[nbrs] = n_agg
        n_agg += 1
    for i in range(n):
        if agg[i] != -1:
            continue
        sl = slice(indptr[i], indptr[i + 1])
        nbrs = indices[sl][strong[sl]]
        hit = nbrs[agg[nbrs] != -1]
        if hit.size:
            agg[i] = agg[hit[0]]
    for i in range(n):
        if agg[i] == -1:
            agg[i] = n_agg
            n_agg += 1
    return agg, n_agg


def _tentative_prolongator(agg: np.ndarray, n_agg: int, dtype) -> CSR:
    """P_t: one entry per row, column = aggregate id, unit-norm columns
    (the constant vector restricted to each aggregate, normalized)."""
    n = agg.shape[0]
    sizes = np.bincount(agg, minlength=n_agg).astype(np.float64)
    data = (1.0 / np.sqrt(sizes))[agg]
    return CSR(
        data=jnp.asarray(data.astype(dtype)),
        indices=agg.astype(_INT),
        indptr=np.arange(n + 1, dtype=_INT),
        shape=(n, n_agg),
    )


def _row_scale(a: CSR, s: np.ndarray) -> CSR:
    """diag(s) · A with a host row expansion (pattern unchanged)."""
    indptr = np.asarray(a.indptr)
    rows = np.repeat(np.arange(a.shape[0], dtype=np.int64), np.diff(indptr))
    return sp_scale(a, jnp.asarray(s[rows].astype(np.asarray(a.data).dtype)))


def _rho_dinv_a(a_sp, dinv: np.ndarray, iters: int = 15) -> float:
    """Power-iteration estimate of ρ(D⁻¹A) on host fp64."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=a_sp.shape[0])
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = dinv * (a_sp @ v)
        nw = np.linalg.norm(w)
        if nw == 0.0:
            return 1.0
        lam = float(v @ w)
        v = w / nw
    return abs(lam)


@dataclass
class _Level:
    a: CSR                      # operator at this level
    dinv: jnp.ndarray           # 1 / diag(A) for Jacobi smoothing
    p: Optional[CSR] = None     # prolongator: next-coarser -> this level
    r: Optional[CSR] = None     # restriction = pᵀ


@dataclass(eq=False)  # id-hashable so jax.jit(M) can cache on the instance
class AMGPreconditioner:
    """v ↦ one V-cycle of smoothed-aggregation AMG applied to v.

    Callable and jit-compatible in the vector ((n,) or (n, k)); pass as
    ``M=`` to `linalg.cg`. Also usable as a standalone stationary solver
    via repeated `x += M(b - A x)` (error contraction per cycle is
    typically 0.1-0.5 on M-matrices).
    """

    levels: List[_Level]
    coarse_lu: Tuple[jnp.ndarray, jnp.ndarray]
    jacobi_omega: float
    presmooth: int
    postsmooth: int
    method: str = "auto"

    def _smooth(self, lvl: _Level, b, x, sweeps: int):
        d = lvl.dinv if b.ndim == 1 else lvl.dinv[:, None]
        for _ in range(sweeps):
            x = x + self.jacobi_omega * d * (
                b - ops.spmm(lvl.a, x, method=self.method)
            )
        return x

    def _cycle(self, i: int, b):
        lvl = self.levels[i]
        if lvl.p is None:  # coarsest
            lu, piv = self.coarse_lu
            flat = b if b.ndim == 2 else b[:, None]
            x = jax.scipy.linalg.lu_solve((lu, piv), flat)
            return x if b.ndim == 2 else x[:, 0]
        x = self._smooth(lvl, b, jnp.zeros_like(b), self.presmooth)
        r = b - ops.spmm(lvl.a, x, method=self.method)
        rc = ops.spmm(lvl.r, r, method=self.method)
        ec = self._cycle(i + 1, rc)
        x = x + ops.spmm(lvl.p, ec, method=self.method)
        return self._smooth(lvl, b, x, self.postsmooth)

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        return self._cycle(0, v)

    @property
    def grid_complexity(self) -> float:
        """Σ nnz(A_l) / nnz(A_0) — the standard AMG memory-cost metric."""
        n0 = int(np.asarray(self.levels[0].a.indptr)[-1])
        return sum(
            int(np.asarray(l.a.indptr)[-1]) for l in self.levels
        ) / max(n0, 1)

    def report(self) -> str:
        lines = ["AMG hierarchy (smoothed aggregation):"]
        for i, l in enumerate(self.levels):
            nnz = int(np.asarray(l.a.indptr)[-1])
            lines.append(
                f"  level {i}: n={l.a.shape[0]:>8d} nnz={nnz:>10d}"
                + ("  [coarse: dense LU]" if l.p is None else "")
            )
        lines.append(f"  grid complexity {self.grid_complexity:.2f}, "
                     f"Jacobi omega {self.jacobi_omega:.3f}")
        return "\n".join(lines)


def smoothed_aggregation_setup(
    a: Operator,
    *,
    theta: float = 0.08,
    max_levels: int = 10,
    coarse_size: int = 200,
    presmooth: int = 2,
    postsmooth: int = 2,
    jacobi_omega: float = 2.0 / 3.0,
    method: str = "auto",
) -> AMGPreconditioner:
    """Build the AMG hierarchy for (near-)SPD A. Host-side setup over
    concrete values (like `ilu0`/plan building); the result applies
    under jit. θ is the strength threshold, `coarse_size` the dense
    direct-solve cutoff."""
    a = _as_csr(a)
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"amg needs square A, got {a.shape}")
    dtype = np.asarray(a.data).dtype
    levels: List[_Level] = []
    cur = a
    while True:
        n = cur.shape[0]
        indptr = np.asarray(cur.indptr)
        indices = np.asarray(cur.indices)
        vals = np.asarray(cur.data).astype(np.float64)
        dvec = np.zeros(n, np.float64)
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        on_diag = rows == indices
        dvec[rows[on_diag]] = vals[on_diag]
        if (dvec == 0).any():
            raise ValueError(
                "amg needs a structurally present nonzero diagonal "
                f"(first missing at row {int(np.argmin(dvec != 0))})"
            )
        dinv = 1.0 / dvec
        lvl = _Level(a=cur, dinv=jnp.asarray(dinv.astype(dtype)))
        levels.append(lvl)
        if n <= coarse_size or len(levels) >= max_levels:
            break
        _, strong = _strength_graph(indptr, indices, vals, theta)
        agg, n_agg = _aggregate(indptr, indices, rows, strong, n)
        if n_agg >= n:  # coarsening stalled — stop here
            break
        p_t = _tentative_prolongator(agg, n_agg, dtype)
        # P = (I - omega * D^-1 A) P_t, omega = 4/3 / rho(D^-1 A)
        rho = _rho_dinv_a(cur.to_scipy().astype(np.float64), dinv)
        omega = (4.0 / 3.0) / max(rho, 1e-12)
        dinv_a = _row_scale(cur, dinv)
        p = sp_sub(p_t, sp_scale(spgemm(dinv_a, p_t), omega))
        r = ops.transpose_csr(p)
        lvl.p, lvl.r = p, r
        cur = spgemm(r, spgemm(cur, p))  # Galerkin A_c = P^T A P
    coarse_dense = jnp.asarray(
        np.asarray(levels[-1].a.to_dense(), np.float64).astype(np.float32)
    )
    coarse_lu = jax.scipy.linalg.lu_factor(coarse_dense)
    return AMGPreconditioner(
        levels=levels,
        coarse_lu=coarse_lu,
        jacobi_omega=jacobi_omega,
        presmooth=presmooth,
        postsmooth=postsmooth,
        method=method,
    )


def amg_preconditioner(a: Operator, **kwargs) -> Callable:
    """M ≈ A⁻¹ as one smoothed-aggregation V-cycle — the scalable
    preconditioner for `linalg.cg` on grid/graph Laplacian-like systems
    (iteration counts stay ~constant as n grows, unlike Jacobi/IC(0))."""
    return smoothed_aggregation_setup(a, **kwargs)
