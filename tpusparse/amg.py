"""Algebraic multigrid (smoothed aggregation) preconditioner.

No reference analog (the reference stops at the matmul layer,
SURVEY.md §2.1) — this is the capstone consumer of the framework's own
primitives: the setup phase builds the whole grid hierarchy with
the framework's SpGEMM schedules (Galerkin triple product Pᵀ·A·P via
`spgemm_plan` + host value passes — see the note above
`smoothed_aggregation_setup`), and the apply phase is
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
from tpusparse.linalg import Operator, _as_csr
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
class _HybridOp:
    """Level operator split as DIA(top diagonals) + CSR(remainder).

    3-D Galerkin coarse operators spread over thousands of diagonals
    with poor concentration (laplace3d_64 L1: 3523 diagonals, the top
    1024 cover only 88% of nnz) — too wide for pure DIA's padded
    storage, but the gather floor (~15 ns/nnz) makes pure CSR ~1750x
    off the streaming roofline. The split keeps every diagonal whose
    streaming cost beats gathering its entries (cost-model routed at
    setup) and gathers only the thin tail: measured 14.4 ms → ~2.4 ms
    per L1 matvec class. Applies under jit; both parts differentiable.
    """

    dia: object  # DIA part (top diagonals)
    rem: CSR     # remainder on the gather path
    shape: Tuple[int, int]

    def mv(self, x):
        from tpusparse.kernels.dia import PackedDIA as _PackedDIA

        dia_y = (
            self.dia.mv(x)
            if isinstance(self.dia, _PackedDIA)
            else ops.dia_spmm(self.dia, x)
        )
        return dia_y + ops.spmm(self.rem, x, method="gather")


class _HostPattern:
    """Host CSR triple as hashable pytree AUX (id-hash, like plans)."""

    def __init__(self, indptr, indices, data, shape):
        self.indptr = np.asarray(indptr)
        self.indices = np.asarray(indices)
        self.data = np.asarray(data)
        self.shape = tuple(shape)

    def to_dense(self):
        m, k = self.shape
        out = np.zeros((m, k), self.data.dtype)
        rows = np.repeat(np.arange(m), np.diff(self.indptr))
        out[rows, self.indices] = self.data
        return out


@dataclass
class _RoutedCSR:
    """CSR applied through a SETUP-RESOLVED executor.

    When the hierarchy rides as a jit ARGUMENT (the literal-free form —
    the only one the tunnel can compile past ~100 MB of level data), the
    pattern leaves are tracers, so ops.spmm's router falls back to the
    in-trace gather floor: measured 85 ms/iter on laplace3d_64 AMG-CG vs
    ~24 with the executors this container resolves ONCE at setup, where
    the pattern is concrete. Stores exactly what the chosen executor
    needs as pytree leaves:
      'blocks' — inspector plan (aux) + packed ELL values (leaf);
      'gather' — values + column indices + HOST-expanded sorted row ids
                 (the jittable searchsorted expansion the traced path
                 would otherwise re-run per matvec);
      'dense'  — the dense operand (latency-class small levels);
      'op'     — a (Packed)DIA the router promoted.
    """

    kind: str
    shape: Tuple[int, int]
    nnz: int = 0
    plan: object = None       # aux ('blocks')
    host: object = None       # aux: _HostPattern (introspection/tests)
    bv: object = None         # leaf ('blocks')
    dense: object = None      # leaf ('dense')
    data: object = None       # leaf ('gather')
    indices: object = None    # leaf ('gather')
    rows: object = None       # leaf ('gather')
    op: object = None         # leaf subtree ('op': DIA / PackedDIA)

    def mv(self, x):
        one_d = x.ndim == 1
        x2 = x[:, None] if one_d else x
        if self.kind == "blocks":
            y = ops.spmm_blocks(self.plan, self.bv, x2)
        elif self.kind == "dense":
            from tpusparse import dense as _dense

            y = _dense.matmul(self.dense, x2)
        elif self.kind == "op":
            y = _op_mv(self.op, x2)
        else:  # gather
            g = self.data[:, None] * x2[self.indices, :]
            y = jax.ops.segment_sum(
                g, self.rows, num_segments=self.shape[0],
                indices_are_sorted=True,
            )
        return y[:, 0] if one_d else y

    def to_dense(self):  # test/introspection parity with CSR
        return jnp.asarray(self.host.to_dense())


def _routed_csr(ip, ix, d, shape, dtype) -> "_RoutedCSR":
    """Resolve a CSR's executor at setup (concrete pattern) — see
    _RoutedCSR. `ip`/`ix`/`d` are host numpy."""
    from tpusparse.plan import build_plan

    ip = np.asarray(ip)
    ix = np.asarray(ix)
    d = np.asarray(d).astype(dtype)
    m, k = shape
    host = _HostPattern(ip, ix, d, shape)
    csr = CSR(
        data=jnp.asarray(d), indices=np.asarray(ix, np.int32),
        indptr=np.asarray(ip, np.int32), shape=shape,
    )
    probe = np.zeros((k, 1), np.float32)
    try:
        method = ops._route_spmm(csr, probe, None)
    except Exception:
        method = "gather"
    nnz = int(ip[-1])
    if method == "dense" and m * k * 4 <= 128e6:
        return _RoutedCSR(
            kind="dense", shape=shape, nnz=nnz, host=host,
            dense=jnp.asarray(host.to_dense()),
        )
    if method == "dia":
        from tpusparse.kernels.dia import pack_dia_operator
        from tpusparse.types import csr_to_dia

        dia = csr_to_dia(csr)
        op = (
            pack_dia_operator(dia.data, np.asarray(dia.offsets), shape)
            if np.asarray(dia.offsets).size > 128
            else dia
        )
        return _RoutedCSR(kind="op", shape=shape, nnz=nnz, host=host, op=op)
    if method in ("tiled", "resident", "naive", "reference"):
        plan = build_plan(csr)
        return _RoutedCSR(
            kind="blocks", shape=shape, nnz=nnz, host=host, plan=plan,
            bv=plan.pack_values(csr.data),
        )
    rows = np.repeat(np.arange(m, dtype=np.int32), np.diff(ip))
    return _RoutedCSR(
        kind="gather", shape=shape, nnz=nnz, host=host,
        data=jnp.asarray(d), indices=jnp.asarray(ix.astype(np.int32)),
        rows=jnp.asarray(rows),
    )


def _op_mv(a, x):
    """Matvec for a level operator in any of its formats."""
    from tpusparse.kernels.dia import PackedDIA as _PackedDIA
    from tpusparse.types import DIA as _DIA

    if isinstance(a, _HybridOp):
        return a.mv(x)
    if isinstance(a, (_PackedDIA, _RoutedCSR)):
        return a.mv(x)
    if isinstance(a, _DIA):
        return ops.dia_spmm(a, x)
    return None  # CSR: caller uses ops.spmm with its routing method


@dataclass
class _FactoredP:
    """P = (I − ω·D⁻¹A)·P_t applied in FACTORED form.

    The assembled smoothed prolongator is irregular (one XLA scalar
    gather per nonzero, ~14 ns each — P/R matvecs were 74 of a 105 ms
    V-cycle at 1M rows). But P_t is one weighted entry per row, and
    D⁻¹A inherits A's structure, so on DIA/hybrid levels:
      P·e  = t − ω·(D⁻¹A)·t           with t = w ⊙ e[agg]   (ONE m-gather)
      Pᵀ·r = segment_sum(w ⊙ y, agg)  with y = r − ω·(D⁻¹A)ᵀ·r  (ONE m-scatter)
    — nnz-many gathers collapse to m-many, everything else streams."""

    agg: jnp.ndarray      # (m,) int32 aggregate id per fine node
    w: jnp.ndarray        # (m,) tentative weights (1/√aggregate size)
    dinv_a: object        # DIA or _HybridOp of D⁻¹A at the fine level
    dinv_a_t: object      # its transpose
    omega: float
    shape: Tuple[int, int]  # (m, n_agg)
    # windowed index plans (kernels/windowed.py): aggregation maps are
    # local by construction, so the m-element expand/reduce run as
    # vector window sweeps instead of the ~15 ns/el XLA index floor —
    # the two ops were 16.5 ms of a 20 ms V-cycle at 1M rows (measured
    # 4.7x / 6.5x on chip). None => stock XLA ops (2-D vectors too).
    gplan: object = None
    splan: object = None

    def _expand(self, e):
        if self.gplan is not None and e.ndim == 1:
            from tpusparse.kernels.windowed import windowed_gather

            return windowed_gather(e, self.gplan)
        return e[self.agg] if e.ndim == 1 else e[self.agg, :]

    def mv(self, e):
        t = (self.w if e.ndim == 1 else self.w[:, None]) * self._expand(e)
        return t - self.omega * _op_mv(self.dinv_a, t)

    def rmv(self, r):
        y = r - self.omega * _op_mv(self.dinv_a_t, r)
        y = (self.w if r.ndim == 1 else self.w[:, None]) * y
        if self.splan is not None and y.ndim == 1:
            from tpusparse.kernels.windowed import windowed_segment_sum

            return windowed_segment_sum(y, self.splan)
        return jax.ops.segment_sum(y, self.agg, num_segments=self.shape[1])


@dataclass
class _Level:
    a: object                   # operator at this level (CSR, or DIA when
    #                             banded — the gather-free matvec path)
    dinv: jnp.ndarray           # 1 / diag(A) for Jacobi smoothing
    nnz: int = 0                # structural nnz of the CSR pattern
    rho: float = 0.0            # ρ(D⁻¹A) estimate (Chebyshev interval)
    p: Optional[CSR] = None     # prolongator: next-coarser -> this level
    r: Optional[CSR] = None     # restriction = pᵀ
    p_fact: Optional["_FactoredP"] = None  # factored apply (DIA levels)
    p_op: Optional["_RoutedCSR"] = None  # setup-resolved P apply (CSR lvls)
    r_op: Optional["_RoutedCSR"] = None  # setup-resolved R apply


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
    smoother: str = "jacobi"
    cheb_alpha: float = 8.0

    def _amv(self, lvl: _Level, x):
        """A_l @ x in the level's format (DIA / hybrid / routed CSR)."""
        y = _op_mv(lvl.a, x)
        return ops.spmm(lvl.a, x, method=self.method) if y is None else y

    def _smooth(self, lvl: _Level, b, x, sweeps: int):
        if sweeps <= 0:
            return x
        d = lvl.dinv if b.ndim == 1 else lvl.dinv[:, None]
        if self.smoother == "chebyshev":
            return self._chebyshev(lvl, b, x, sweeps, d)
        for _ in range(sweeps):
            x = x + self.jacobi_omega * d * (b - self._amv(lvl, x))
        return x

    def _chebyshev(self, lvl: _Level, b, x, degree: int, d):
        """Degree-`degree` Chebyshev polynomial smoother on D⁻¹A over the
        upper-spectrum interval [ρ/α, ρ] — targets exactly the
        high-frequency error the coarse grid cannot see, with no damping
        parameter to tune. α=8 default: measured V-cycle error radius on
        2-D Poisson at matched spmm count (degree 2+2) is 0.23 vs 0.29
        for ω=2/3 Jacobi (α=30, pyamg's degree-3 convention, gave 0.61 at
        degree 2 — the wide interval needs the higher degree). Standard
        3-term recurrence; every term is one spmm + elementwise work."""
        lmax = 1.1 * max(lvl.rho, 1e-12)  # safety margin on the estimate
        lmin = lmax / self.cheb_alpha
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho_k = 1.0 / sigma
        res = d * (b - self._amv(lvl, x))
        dk = res / theta
        x = x + dk
        for _ in range(degree - 1):
            rho_next = 1.0 / (2.0 * sigma - rho_k)
            res = d * (b - self._amv(lvl, x))
            dk = rho_next * rho_k * dk + (2.0 * rho_next / delta) * res
            x = x + dk
            rho_k = rho_next
        return x

    def _cycle(self, i: int, b):
        lvl = self.levels[i]
        if lvl.p is None:  # coarsest
            lu, piv = self.coarse_lu
            flat = b if b.ndim == 2 else b[:, None]
            x = jax.scipy.linalg.lu_solve((lu, piv), flat)
            return x if b.ndim == 2 else x[:, 0]
        x = self._smooth(lvl, b, jnp.zeros_like(b), self.presmooth)
        r = b - self._amv(lvl, x)
        if lvl.p_fact is not None:
            rc = lvl.p_fact.rmv(r)
            ec = self._cycle(i + 1, rc)
            x = x + lvl.p_fact.mv(ec)
        else:
            rc = (
                lvl.r_op.mv(r)
                if lvl.r_op is not None
                else ops.spmm(lvl.r, r, method=self.method)
            )
            ec = self._cycle(i + 1, rc)
            pe = (
                lvl.p_op.mv(ec)
                if lvl.p_op is not None
                else ops.spmm(lvl.p, ec, method=self.method)
            )
            x = x + pe
        return self._smooth(lvl, b, x, self.postsmooth)

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        return self._cycle(0, v)

    @property
    def grid_complexity(self) -> float:
        """Σ nnz(A_l) / nnz(A_0) — the standard AMG memory-cost metric."""
        return sum(l.nnz for l in self.levels) / max(self.levels[0].nnz, 1)

    def report(self) -> str:
        from tpusparse.kernels.dia import PackedDIA as _PackedDIA
        from tpusparse.types import DIA as _DIA

        lines = ["AMG hierarchy (smoothed aggregation):"]
        for i, l in enumerate(self.levels):
            if isinstance(l.a, (_DIA, _PackedDIA)):
                fmt = f"dia:{l.a.offsets.size}"
            elif isinstance(l.a, _HybridOp):
                fmt = (
                    f"dia:{l.a.dia.offsets.size}+csr:{l.a.rem.nnz}"
                )
            else:
                fmt = "csr"
            lines.append(
                f"  level {i}: n={l.a.shape[0]:>8d} nnz={l.nnz:>10d} [{fmt}]"
                + ("  [coarse: dense LU]" if l.p is None else "")
            )
        lines.append(f"  grid complexity {self.grid_complexity:.2f}, "
                     f"Jacobi omega {self.jacobi_omega:.3f}")
        return "\n".join(lines)


# ---- host value algebra over the framework's own SpGEMM schedules ----
#
# Setup runs ENTIRELY on the host: values are concrete at setup time
# (ilu0's contract), and doing the one-shot value passes with jnp would
# compile a fresh XLA program per unique shape per level — measured
# 274 TPU compilations / 126 s of a 145 s setup at n=262k. The numpy
# passes below ride the SAME native symbolic schedules as `spgemm`
# (csrc ts_spgemm_*) and cost milliseconds.


def _h_spgemm(aip, aix, ad, bip, bix, bd, m, n):
    """C = A @ B on host numpy via the spgemm multiplication schedule.

    Calls the native symbolic pass (csrc ts_spgemm_*) directly rather
    than `spgemm_plan`: the plan object stores its schedule on DEVICE,
    and pulling ~100MB schedules back through the TPU tunnel dominated
    setup (5.9 s warm, minutes when the tunnel is slow). Setup-only
    patterns also shouldn't pollute the device plan cache."""
    from tpusparse.runtime import native

    if native.available():
        res = native.spgemm_symbolic(aip, aix, bip, bix, m, n)
        if res is not None:
            c_indptr, c_indices, a_pos, b_pos, c_pos = res
            cd = np.bincount(
                c_pos,
                weights=ad[a_pos] * bd[b_pos],
                minlength=c_indices.shape[0],
            )
            return c_indptr, c_indices, cd
    # fallback: scipy's SMMP spgemm (same structural-pattern semantics)
    import scipy.sparse as _ssp

    k = bip.shape[0] - 1
    c = (
        _ssp.csr_matrix((ad, aix, aip), shape=(m, k))
        @ _ssp.csr_matrix((bd, bix, bip), shape=(k, n))
    ).tocsr()
    c.sort_indices()
    return c.indptr.astype(_INT), c.indices.astype(_INT), c.data


def _h_sub(aip, aix, ad, bip, bix, bd, m, n):
    """A - B on host numpy (union pattern, scipy/sp_sub semantics)."""
    ra = np.repeat(np.arange(m, dtype=np.int64), np.diff(aip))
    rb = np.repeat(np.arange(m, dtype=np.int64), np.diff(bip))
    fa = ra * n + aix.astype(np.int64)
    fb = rb * n + bix.astype(np.int64)
    uniq = np.union1d(fa, fb)
    cd = np.zeros(uniq.size, np.float64)
    np.add.at(cd, np.searchsorted(uniq, fa), ad)
    np.subtract.at(cd, np.searchsorted(uniq, fb), bd)
    indptr = np.zeros(m + 1, np.int64)
    np.cumsum(np.bincount((uniq // n).astype(np.int64), minlength=m),
              out=indptr[1:])
    return indptr.astype(_INT), (uniq % n).astype(_INT), cd


def _h_transpose(ip, ix, d, m, n):
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(ip))
    perm = np.argsort(ix, kind="stable")
    t_indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(ix, minlength=n), out=t_indptr[1:])
    return t_indptr.astype(_INT), rows[perm].astype(_INT), d[perm]


# ---- pytree registration ---------------------------------------------------
# The hierarchy holds device arrays that can exceed the axon tunnel's
# ~100 MB jit-literal payload limit (laplace3d_64's L1 DIA plane alone is
# 219 MB). Closed-over device buffers embed as HLO LITERALS (r2 learning,
# CLAUDE.md), so the preconditioner must be passable as a jit ARGUMENT:
# register every container as a pytree (arrays = leaves, scalars/shapes =
# static aux). jax.jit(M) still works (id-hashable callable); big timed
# programs thread M through the timer's x0 instead of closing over it.


def _register(cls, leaf_fields, aux_fields):
    def flatten(obj):
        return (
            tuple(getattr(obj, f) for f in leaf_fields),
            tuple(getattr(obj, f) for f in aux_fields),
        )

    def unflatten(aux, leaves):
        kw = dict(zip(leaf_fields, leaves))
        kw.update(zip(aux_fields, aux))
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


_register(_HybridOp, ("dia", "rem"), ("shape",))
# plan rides as a LEAF subtree (Plan is itself a registered pytree whose
# aux keeps the static geometry); host (_HostPattern) is id-hash aux like
# plans. Without this registration any hierarchy holding a CSR-routed
# level raised TypeError when passed as a jit argument (r4 advisor, high).
_register(
    _RoutedCSR,
    ("bv", "dense", "data", "indices", "rows", "op", "plan"),
    ("kind", "shape", "nnz", "host"),
)
_register(
    _FactoredP,
    ("agg", "w", "dinv_a", "dinv_a_t"),
    ("omega", "shape", "gplan", "splan"),
)
_register(
    _Level,
    ("a", "dinv", "p", "r", "p_fact", "p_op", "r_op"),
    ("nnz", "rho"),
)
_register(
    AMGPreconditioner,
    ("levels", "coarse_lu"),
    (
        "jacobi_omega", "presmooth", "postsmooth", "method", "smoother",
        "cheb_alpha",
    ),
)


_SCAN_STEP_S = 20e-6  # measured fixed cost per dia_spmm scan step (v5e r3)
_SCAN_U = 32          # must match ops.dia_spmm's chunk width
_DIA_KERNEL_BW = 500e9  # r5 wide-DIA Pallas kernel effective stream rate
#                         (grouped shifted-x rewrite: 1909×32768 in
#                         0.439 ms = ~570 GB/s; 500e9 keeps a margin).
#                         Raising this keeps MORE diagonals per level
#                         (threshold ~15 entries/diagonal at 32k rows).


def _route_level(cur_ip, cur_ix, cur_d, n: int, dtype):
    """Per-diagonal format routing for a level operator (host, setup).

    Keeps every diagonal whose padded streaming cost (3 fp32 passes of n
    at dia_bw) is cheaper than gathering its entries (gather floor), up
    to a 256 MB padded-data budget (largest diagonals first). Returns
    None for all-CSR, else (dia_host (K, n), offsets (K,), remainder)
    where remainder is None (pure DIA) or a host CSR triple of the
    dropped diagonals' entries.

    Many-diagonal acceptance (>128 kept → the chunked-scan lowering)
    additionally requires the scan path to beat BOTH the gather floor
    and a block-executor estimate (occupied 128² blocks × the calibrated
    per-slot overhead): mid-size levels with dense-ish block structure
    are better served by `ops.spmm(method='auto')`'s executors (measured
    r3: a 2407-row 279-diagonal level took 0.39 ms on the scan path vs
    0.015 ms auto-routed), so those stay CSR."""
    c = ops.get_cost_constants()
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(cur_ip))
    offs_all = cur_ix.astype(np.int64) - rows
    u, inv = np.unique(offs_all, return_inverse=True)
    cnt = np.bincount(inv, minlength=u.size)
    # wide-DIA (>128 diagonals) runs the r4 Pallas kernel, which streams
    # the padded data ONCE with x VMEM-resident — measured 26.7 ps per
    # padded element on v5e (1909×32768 in 1.67 ms, kernels/dia.py), i.e.
    # an effective ~150 GB/s including its per-diagonal VPU work. The
    # narrow (≤128) path is the unrolled XLA one at 3 passes of dia_bw.
    # The selection must price diagonals at the rate of the path it will
    # ACTUALLY trigger: with the default constants the narrow 3-pass
    # threshold is LOOSER than the kernel's, so a narrow-priced keep can
    # spill past 128 and land on the wide path it never priced — pick
    # the narrow set only when it stays on the unrolled path (clamped to
    # its 128 largest diagonals), the kernel-priced set otherwise.
    keep_n = cnt * c["gather_per_nnz_floor"] > n * 3 * 4.0 / c["dia_bw"]
    keep_w = cnt * c["gather_per_nnz_floor"] > n * 4.0 / _DIA_KERNEL_BW
    if int(keep_n.sum()) <= 128:
        keep = keep_n
    elif int(keep_w.sum()) > 128:
        keep = keep_w
    else:
        # narrow pricing admits >128 but kernel pricing keeps ≤128:
        # stay on the unrolled path with the 128 largest diagonals
        order = np.argsort(-cnt)
        sel = np.zeros(u.size, bool)
        sel[order[:128]] = True
        keep = keep_n & sel
    budget = (256 * 1024 * 1024) // max(n * np.dtype(dtype).itemsize, 1)
    if int(keep.sum()) > budget:
        order = np.argsort(-cnt)
        sel = np.zeros(u.size, bool)
        sel[order[:budget]] = True
        keep &= sel
    nd_kept = int(keep.sum())
    if nd_kept > 128:
        # hybrid total = kernel stream of kept diagonals + gather of the
        # dropped remainder (the r3 model omitted the remainder and used
        # the old 3-pass scan rate; with the r4 kernel the DIA side is
        # ~2.4x cheaper, which re-routes e.g. laplace3d_64's L1)
        rem_nnz = float(cur_ip[-1]) - float(cnt[keep].sum())
        t_dia = (
            nd_kept * n * 4.0 / _DIA_KERNEL_BW
            + rem_nnz * c["gather_per_nnz_floor"]
        )
        t_gather = float(cur_ip[-1]) * c["gather_per_nnz_floor"]
        alts = [t_gather]
        if n <= 8192:
            # latency-class regime: spmm-auto's dense/tiled executors
            # finish small levels in tens of µs (r3: 2407-row 279-diag
            # level 0.39 ms scanned vs 0.015 ms auto-routed). Past a few
            # k rows this block estimate is fiction for the V-cycle's
            # n=1 matvecs — the router sends SpMV to gather there, and
            # the r3 gate's unconditional use of it mis-routed
            # laplace3d's L1 to CSR (modeled 0.8 ms, measured 8.9 ms).
            blocks = np.unique(
                (rows // 128) * (1 + n // 128)
                + cur_ix.astype(np.int64) // 128
            ).size
            alts.append(blocks * c["tiled_slot_overhead"] + _SCAN_STEP_S)
        if t_dia >= min(alts):
            return None
    if not keep.any():
        return None
    kept = np.flatnonzero(keep)
    slot = np.full(u.size, -1, np.int64)
    slot[kept] = np.arange(kept.size)
    in_dia = keep[inv]
    dia_host = np.zeros((kept.size, n), dtype)
    dia_host[slot[inv[in_dia]], rows[in_dia]] = cur_d[in_dia].astype(dtype)
    dia_offs = u[kept]
    if bool(in_dia.all()):
        return dia_host, dia_offs, None
    rem_rows = rows[~in_dia]
    rem_ip = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rem_rows, minlength=n), out=rem_ip[1:])
    rem = (
        rem_ip.astype(_INT),
        cur_ix[~in_dia].astype(_INT),
        cur_d[~in_dia],
    )
    return dia_host, dia_offs, rem


def smoothed_aggregation_setup(
    a: Operator,
    *,
    theta: float = 0.08,
    theta_decay: float = 0.5,
    max_levels: int = 10,
    coarse_size: int = 200,
    presmooth: int = 2,
    postsmooth: int = 2,
    jacobi_omega: float = 2.0 / 3.0,
    method: str = "auto",
    smoother: str = "jacobi",
    cheb_alpha: float = 8.0,
    level_dtype: str | None = None,
) -> AMGPreconditioner:
    """Build the AMG hierarchy for (near-)SPD A. Host-side setup over
    concrete values (like `ilu0`/plan building); the result applies
    under jit. θ is the strength threshold, `coarse_size` the dense
    direct-solve cutoff.

    The strength threshold decays ON STALL: a level whose aggregation
    coarsens by less than 2x retries with θ·theta_decay (repeatedly, to
    a θ·decay^8 floor; the reached θ carries to coarser levels). Galerkin
    coarse operators spread their mass over wider, weaker stencils — a
    FIXED θ then classifies nearly every coarse connection as weak,
    aggregation degenerates to singletons, and the hierarchy stalls with
    nearly-dense coarse levels (measured on laplace3d_64: L1→L2
    coarsened 31868→29282 with L2 44% dense; 31868→2861→66 with the
    decay). Decaying UNCONDITIONALLY per level (Vaněk's schedule) is
    worse where fixed θ was fine: on laplace2d_1024 it admitted weak
    connections into 2-D aggregates and scattered each level over
    hundreds of 1-entry diagonals (V-cycle 21 ms vs ~7 with the fixed-θ
    hierarchy, measured r3) — hence decay only when needed.

    level_dtype='bfloat16' stores the DIA PLANES (level operators and
    the factored prolongators' D⁻¹A planes) in bf16 — a MEMORY option,
    not a speed one: laplace3d_64's hierarchy carries three ~217 MB L1
    planes, and bf16 halves that footprint, but the wide-DIA kernel is
    VPU-bound (rolls/selects), so AMG-CG time measured NEUTRAL (6.65 vs
    6.61 ms/iter interleaved on-chip, resid 5.13e-5 both ways — r5).
    M is a preconditioner, so the ~3 lost decimal digits live entirely
    inside M; the outer CG/solver still runs the exact fp32 operator.
    Indices, dinv, P/R values, and CSR remainders stay fp32."""
    a = _as_csr(a)
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"amg needs square A, got {a.shape}")
    if smoother not in ("jacobi", "chebyshev"):
        raise ValueError(f"unknown smoother {smoother!r} (jacobi/chebyshev)")
    if level_dtype not in (None, "bf16", "bfloat16"):
        raise ValueError(f"unknown level_dtype {level_dtype!r}")
    plane_cast = (
        (lambda v: jnp.asarray(v).astype(jnp.bfloat16))
        if level_dtype
        else (lambda v: jnp.asarray(v))
    )
    dtype = np.asarray(a.data).dtype
    levels: List[_Level] = []
    # host triple of the current level's operator, values in fp64
    cur_ip = np.asarray(a.indptr)
    cur_ix = np.asarray(a.indices)
    cur_d = np.asarray(a.data).astype(np.float64)
    cur_a: CSR = a
    theta_eff = theta  # softened on stall, carried to coarser levels
    while True:
        n = cur_ip.shape[0] - 1
        dvec = np.zeros(n, np.float64)
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(cur_ip))
        on_diag = rows == cur_ix
        dvec[rows[on_diag]] = cur_d[on_diag]
        if (dvec == 0).any():
            raise ValueError(
                "amg needs a structurally present nonzero diagonal "
                f"(first missing at row {int(np.argmin(dvec != 0))})"
            )
        dinv = 1.0 / dvec
        # banded levels get the gather-free DIA matvec — built straight
        # from the HOST triple (cur_d is already on host; routing through
        # _maybe_dia would pull the device copy back through the tunnel,
        # minutes when the tunnel is slow)
        from tpusparse.types import DIA as _DIA

        # Adaptive DIA acceptance (r2 verdict #3): the old fixed 128-offset
        # cap dropped every non-fine 3-D level to the CSR gather floor
        # (~15 ns/nnz). DIA cost scales with BYTES (noff·n), not nnz, so
        # each diagonal is routed individually: keep it when streaming
        # its padded row beats gathering its entries, gather the tail as
        # a CSR remainder (_HybridOp). Pure-banded levels come out all-
        # DIA, genuinely scattered ones all-CSR — no format cliff.
        split = _route_level(cur_ip, cur_ix, cur_d, n, dtype)
        dia_host = dia_offs = rem_host = None
        if split is None:
            # CSR level: executor resolved NOW, while the pattern is
            # concrete (_RoutedCSR docstring — in jit-argument form the
            # traced pattern would fall to the in-trace gather floor)
            a_level = _routed_csr(cur_ip, cur_ix, cur_d, (n, n), dtype)
        else:
            dia_host, dia_offs, rem_host = split
            if dia_offs.size > 128:
                # wide plane: the Pallas SpMV kernel runs it, and storing
                # it PRE-PACKED keeps the hierarchy usable as a jit
                # ARGUMENT (a plain DIA leaf would either embed a
                # >100 MB HLO literal when closed over — past the tunnel
                # compile-payload limit — or re-pack per matvec when
                # threaded; kernels/dia.py PackedDIA docstring)
                from tpusparse.kernels.dia import pack_dia_operator

                dia_part = pack_dia_operator(
                    plane_cast(dia_host), dia_offs, (n, n)
                )
            else:
                dia_part = _DIA(
                    data=plane_cast(dia_host), offsets=dia_offs,
                    shape=(n, n),
                )
            if rem_host is None:
                a_level = dia_part
            else:
                rem_ip, rem_ix, rem_d = rem_host
                a_level = _HybridOp(
                    dia=dia_part,
                    rem=CSR(
                        data=jnp.asarray(rem_d.astype(dtype)),
                        indices=rem_ix, indptr=rem_ip, shape=(n, n),
                    ),
                    shape=(n, n),
                )
        lvl = _Level(
            a=a_level,
            dinv=jnp.asarray(dinv.astype(dtype)),
            nnz=int(cur_ip[-1]),
        )
        levels.append(lvl)
        if n <= coarse_size or len(levels) >= max_levels:
            break
        # decay-on-stall (see docstring): retry aggregation with a
        # softer threshold while it fails to halve the level
        while True:
            _, strong = _strength_graph(cur_ip, cur_ix, cur_d, theta_eff)
            agg, n_agg = _aggregate(cur_ip, cur_ix, rows, strong, n)
            if n_agg <= 0.5 * n or theta_eff <= theta * theta_decay ** 8:
                break
            theta_eff *= theta_decay
        if n_agg >= n:  # coarsening stalled even at the θ floor
            break
        # tentative prolongator (host triple, unit columns)
        sizes = np.bincount(agg, minlength=n_agg).astype(np.float64)
        pt_d = (1.0 / np.sqrt(sizes))[agg]
        pt_ip = np.arange(n + 1, dtype=_INT)
        pt_ix = agg.astype(_INT)
        # P = (I - omega * D^-1 A) P_t, omega = 4/3 / rho(D^-1 A)
        import scipy.sparse as _ssp

        a_sp = _ssp.csr_matrix((cur_d, cur_ix, cur_ip), shape=(n, n))
        rho = _rho_dinv_a(a_sp, dinv)
        lvl.rho = float(rho)
        omega = (4.0 / 3.0) / max(rho, 1e-12)
        da_d = cur_d * dinv[rows]  # diag(dinv) · A values
        ap_ip, ap_ix, ap_d = _h_spgemm(
            cur_ip, cur_ix, da_d, pt_ip, pt_ix, pt_d, n, n_agg
        )
        p_ip, p_ix, p_d = _h_sub(
            pt_ip, pt_ix, pt_d, ap_ip, ap_ix, omega * ap_d, n, n_agg
        )
        r_ip, r_ix, r_d = _h_transpose(p_ip, p_ix, p_d, n, n_agg)
        if dia_host is not None:
            # DIA/hybrid level: apply P in factored form (see _FactoredP);
            # all array construction on host, one push per array
            dinva_host = dia_host * dinv[None, :].astype(dtype)
            offs_l = dia_offs
            t_host = np.zeros_like(dinva_host)
            for d_i in range(offs_l.size - 1, -1, -1):
                off = int(offs_l[d_i])
                t_lo = max(0, off)
                t_hi = min(n, n + off)
                if t_hi > t_lo:
                    t_host[offs_l.size - 1 - d_i, t_lo:t_hi] = dinva_host[
                        d_i, t_lo - off : t_hi - off
                    ]
            from tpusparse.types import DIA as _DIA2

            if offs_l.size > 128:  # pre-pack wide planes (same rationale
                #                    as the level operator above)
                from tpusparse.kernels.dia import pack_dia_operator

                dinv_a = pack_dia_operator(
                    plane_cast(dinva_host), offs_l, (n, n)
                )
                dinv_a_t = pack_dia_operator(
                    plane_cast(t_host), np.sort(-offs_l[::-1]), (n, n)
                )
            else:
                dinv_a = _DIA2(
                    data=plane_cast(dinva_host), offsets=offs_l,
                    shape=(n, n),
                )
                dinv_a_t = _DIA2(
                    data=plane_cast(t_host),
                    offsets=np.sort(-offs_l[::-1]),
                    shape=(n, n),
                )
            if rem_host is not None:
                # remainder of D⁻¹A rides the gather path in both
                # directions — scale rows by dinv, transpose on host
                rem_ip, rem_ix, rem_d = rem_host
                rem_rows = np.repeat(
                    np.arange(n, dtype=np.int64), np.diff(rem_ip)
                )
                rda = rem_d * dinv[rem_rows]
                rt_ip, rt_ix, rt_d = _h_transpose(rem_ip, rem_ix, rda, n, n)
                dinv_a = _HybridOp(
                    dia=dinv_a,
                    rem=CSR(
                        data=jnp.asarray(rda.astype(dtype)),
                        indices=rem_ix, indptr=rem_ip, shape=(n, n),
                    ),
                    shape=(n, n),
                )
                dinv_a_t = _HybridOp(
                    dia=dinv_a_t,
                    rem=CSR(
                        data=jnp.asarray(rt_d.astype(dtype)),
                        indices=rt_ix, indptr=rt_ip, shape=(n, n),
                    ),
                    shape=(n, n),
                )
            # windowed index plans for the m-element expand/reduce (used
            # when the aggregation map is local enough for the vector
            # sweep to beat the XLA index floor — it essentially always
            # is for lexicographic grids; far stragglers ride each
            # plan's built-in exception path)
            from tpusparse.kernels.windowed import (
                modeled_cost_s, windowed_gather_plan,
                windowed_segment_plan, xla_index_cost_s)

            gplan = windowed_gather_plan(agg, n_agg)
            if modeled_cost_s(gplan) > 0.67 * xla_index_cost_s(n):
                gplan = None  # not decisively faster than the XLA op
            # cap 16384: 3-D aggregation maps need ~9.5k y-windows (the
            # members of 128 consecutive aggregates span ~2 fine planes);
            # the default 4096 cap pushed 28% of entries onto the
            # exception path and the plan self-declined (r3). Scratch at
            # W=9472 is ~600 KB — far under the VMEM budget. Renumbering
            # aggregates by min-fine-index was tested and is a no-op
            # (pass-1 root order already yields it).
            splan = windowed_segment_plan(agg, n_agg, cap=16384)
            if modeled_cost_s(splan) > 0.67 * xla_index_cost_s(n):
                splan = None
            lvl.p_fact = _FactoredP(
                agg=jnp.asarray(agg.astype(_INT)),
                w=jnp.asarray(pt_d.astype(dtype)),
                dinv_a=dinv_a,
                dinv_a_t=dinv_a_t,
                omega=float(omega),
                shape=(n, n_agg),
                gplan=gplan,
                splan=splan,
            )
        else:
            # CSR level: resolve the P/R executors NOW, while their
            # patterns are concrete — in jit-argument form (the only one
            # the tunnel compiles past ~100 MB of level data) the traced
            # patterns would fall to the in-trace gather floor, exactly
            # the regression _RoutedCSR documents for the level operator.
            lvl.p_op = _routed_csr(p_ip, p_ix, p_d, (n, n_agg), dtype)
            lvl.r_op = _routed_csr(r_ip, r_ix, r_d, (n_agg, n), dtype)
        # P/R pushes: the V-cycle never touches lvl.p/lvl.r directly
        # (p_fact serves DIA levels both directions; p_op/r_op serve CSR
        # levels), so keep their values HOST-side everywhere. These were
        # the largest arrays in the hierarchy, and host->device pushes
        # ride the ~25 ms-latency tunnel: the laplace2d_1024 setup
        # measured 112 s on-TPU vs 6.3 s forced-CPU with all pushes in
        # (r4) — transfer, not compute, is the setup cost, and the
        # windowed planner the r3 verdict suspected measures 0.16 s of it.
        push = lambda v: v  # noqa: E731
        lvl.p = CSR(
            data=push(p_d.astype(dtype)),
            indices=p_ix, indptr=p_ip, shape=(n, n_agg),
        )
        lvl.r = CSR(
            data=push(r_d.astype(dtype)),
            indices=r_ix, indptr=r_ip, shape=(n_agg, n),
        )
        # Galerkin A_c = (P^T A) P
        ra_ip, ra_ix, ra_d = _h_spgemm(
            r_ip, r_ix, r_d, cur_ip, cur_ix, cur_d, n_agg, n
        )
        cur_ip, cur_ix, cur_d = _h_spgemm(
            ra_ip, ra_ix, ra_d, p_ip, p_ix, p_d, n_agg, n_agg
        )
        # lazy host triple: only pushed if this level routes to CSR
        cur_a = CSR(
            data=cur_d.astype(dtype),
            indices=cur_ix, indptr=cur_ip, shape=(n_agg, n_agg),
        )
    nc = levels[-1].a.shape[0]
    rows_c = np.repeat(np.arange(nc, dtype=np.int64), np.diff(cur_ip))
    coarse64 = np.zeros((nc, nc), np.float64)
    coarse64[rows_c, cur_ix] = cur_d
    coarse_lu = jax.scipy.linalg.lu_factor(jnp.asarray(coarse64.astype(np.float32)))
    return AMGPreconditioner(
        levels=levels,
        coarse_lu=coarse_lu,
        jacobi_omega=jacobi_omega,
        presmooth=presmooth,
        postsmooth=postsmooth,
        method=method,
        smoother=smoother,
        cheb_alpha=cheb_alpha,
    )


def amg_preconditioner(a: Operator, **kwargs) -> Callable:
    """M ≈ A⁻¹ as one smoothed-aggregation V-cycle — the scalable
    preconditioner for `linalg.cg` on grid/graph Laplacian-like systems
    (iteration counts stay ~constant as n grows, unlike Jacobi/IC(0))."""
    return smoothed_aggregation_setup(a, **kwargs)
