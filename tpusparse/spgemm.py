"""SpGEMM — C = A @ B with BOTH operands sparse (CSR), result sparse.

New capability beyond the reference surface: every reference kernel is
sparse x dense (SURVEY.md §2.1 K1-K9; src/baseline_mm.cu, src/sparse_mm.cu),
so composing sparse operators (graph ops like A@A, pruned-weight products)
forces a densify round-trip there. This module closes the algebra under
multiplication the TPU-native way, reusing the framework's inspector-
executor architecture (the design idea behind TiledSpMM_inspect,
reference src/sparse_mm.cu:137-368):

  * A host symbolic pass (numpy, trace-time constant, fingerprint-cached
    like plan.build_plan) computes C's CSR pattern and a flat
    *multiplication schedule*: (a_pos, b_pos, c_pos) triples enumerating
    every scalar product A[i,k]*B[k,j] and the C slot it accumulates
    into, pre-sorted by c_pos.
  * The device numeric pass is two gathers, one multiply, and one sorted
    segment-sum — the XLA-idiomatic execution for irregular accumulation
    on TPU (same reasoning as ops._gather_spmm: at low arithmetic
    intensity the VPU gather path beats any block/MXU formulation).

Semantics match scipy's ``csr_matrix @ csr_matrix`` pattern: C keeps one
slot per *structurally* reachable (i, j) (products may cancel to 0.0
numerically; slots are never dropped, so the pattern — and therefore the
compiled program — is value-independent).

Autograd: ``spgemm`` is differentiable in both operands' values via
``jax.custom_vjp`` with pattern-restricted gradients,

  dA[p] = sum over schedule rows with a_pos==p of  dC[c_pos] * B[b_pos]
  dB[q] = sum over schedule rows with b_pos==q of  dC[c_pos] * A[a_pos]

i.e. exactly SDDMM-style gradients restricted to each operand's own
pattern (the same upgrade over densified gradients that ops.spmm makes;
see ops.py module docstring).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.plan import _fingerprint
from tpusparse.types import CSR

Shape2 = Tuple[int, int]

_INT = np.int32


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SpGEMMPlan:
    """Host-built multiplication schedule for one (A pattern, B pattern) pair.

    All index arrays are trace-time constants (host numpy wrapped as
    device arrays once), mirroring Plan's contract. ``nmul`` is the
    schedule length = sum over A's nonzeros (i,k) of nnz in B row k.
    """

    a_pos: jnp.ndarray  # (nmul,) int32 — index into A.data
    b_pos: jnp.ndarray  # (nmul,) int32 — index into B.data
    c_pos: jnp.ndarray  # (nmul,) int32 — index into C.data, nondecreasing
    c_indices: np.ndarray  # (c_nnz,) int32 host — C's CSR column ids
    c_indptr: np.ndarray  # (m+1,) int32 host — C's CSR row offsets
    a_shape: Shape2
    b_shape: Shape2
    # windowed index plans (kernels/windowed.py), built at schedule time
    # when the modeled vector-sweep cost beats the XLA index floor (the
    # AMG adoption rule, amg.py:673-697). The schedule is sorted by c_pos
    # BY CONSTRUCTION, so the c accumulation and the dC gather in the vjp
    # are maximally local; a_pos walks A's rows nearly in order. None =
    # that component rides the stock XLA op.
    ws_c: object = None   # WindowedSegmentPlan for the c_pos accumulation
    wg_a: object = None   # WindowedGatherPlan for a_data[a_pos]
    wg_b: object = None   # WindowedGatherPlan for b_data[b_pos]
    wg_c: object = None   # WindowedGatherPlan for g[c_pos] (vjp)
    # big-nmul fallback: the windowed segment kernel holds y resident in
    # VMEM, so past ~4M products one plan cannot fit — the sorted
    # schedule splits AT SEGMENT BOUNDARIES into independent chunks
    # (tuples (lo, hi, seg_base, nseg, plan)) whose outputs concatenate
    ws_c_chunks: object = None

    @property
    def nmul(self) -> int:
        return int(self.a_pos.shape[0])

    @property
    def c_nnz(self) -> int:
        return int(self.c_indices.shape[0])

    @property
    def c_shape(self) -> Shape2:
        return (self.a_shape[0], self.b_shape[1])

    def tree_flatten(self):
        return (self.a_pos, self.b_pos, self.c_pos), (
            self.c_indices,
            self.c_indptr,
            self.a_shape,
            self.b_shape,
            self.ws_c,
            self.wg_a,
            self.wg_b,
            self.wg_c,
            self.ws_c_chunks,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        a_pos, b_pos, c_pos = children
        return cls(a_pos, b_pos, c_pos, *aux)

    def report(self) -> dict:
        """Schedule stats (the Plan.report / PRINT-mode analog): work per
        output nonzero and the compression the sparse product achieves
        over a densified one."""
        m, k = self.a_shape
        n = self.b_shape[1]
        dense_mults = float(m) * k * n
        return {
            "nmul": self.nmul,
            "c_nnz": self.c_nnz,
            "mults_per_c_nnz": self.nmul / max(self.c_nnz, 1),
            "c_density": self.c_nnz / float(m * n),
            "dense_mult_ratio": dense_mults / max(self.nmul, 1),
            "schedule_bytes": 3 * 4 * self.nmul,
        }


_PLAN_CACHE: dict = {}


def _windowed_schedule_plans(a_pos, b_pos, c_pos, a_nnz, b_nnz, c_nnz):
    """Windowed plans for the schedule's index ops, each adopted only when
    its modeled sweep cost decisively beats the XLA index floor AND the
    resident arrays fit the VMEM budget (whole-table/whole-y residency is
    how the kernels get random access — kernels/windowed.py)."""
    from tpusparse.kernels.windowed import (
        modeled_cost_s, windowed_gather_plan, windowed_segment_plan,
        xla_index_cost_s)
    from tpusparse.utils.config import get_config

    budget = get_config().vmem_limit_bytes // 2
    nmul = int(np.asarray(a_pos).shape[0])
    # compile-payload cap: windowed plan arrays (rel / seg_masked / mask /
    # exceptions, ~13 bytes/product across the adopted plans) ride the
    # plan's AUX and embed as HLO LITERALS under jit — unlike
    # a_pos/b_pos/c_pos, they can never thread as runtime arguments. The
    # axon-class tunnel rejects remote_compile payloads in the ~100s-of-
    # MB class (CLAUDE.md r2), so past ~10M products the windowed plans
    # stand down and the schedule rides the stock XLA ops (at that fill
    # the router usually prefers the dense route anyway).
    if nmul > 10_000_000:
        return None, None, None, None, None

    def gather(idx, table_len):
        p = windowed_gather_plan(np.asarray(idx), table_len)
        fits = (table_len + p.window + 256) * 4 + 8 * p.window * 4 <= budget
        if fits and modeled_cost_s(p) <= 0.67 * xla_index_cost_s(nmul):
            return p
        return None

    def seg_fits(p, n_in):
        return 2 * (n_in + p.window + 256) * 4 + 16 * p.window * 4 <= budget

    def segment(seg, num_segments):
        seg = np.asarray(seg)
        n_in = int(seg.shape[0])
        p = windowed_segment_plan(seg, num_segments)
        if seg_fits(p, n_in) and (
            modeled_cost_s(p) <= 0.67 * xla_index_cost_s(n_in)
        ):
            return p, None
        if not seg_fits(p, n_in):
            chunks = _chunk_segment_plans(seg, num_segments, seg_fits)
            if chunks is not None and (
                sum(modeled_cost_s(c[4]) for c in chunks)
                <= 0.67 * xla_index_cost_s(n_in)
            ):
                return None, tuple(chunks)
        return None, None

    ws_c, ws_chunks = segment(c_pos, c_nnz)
    return (
        ws_c,
        gather(a_pos, a_nnz),
        gather(b_pos, b_nnz),
        gather(c_pos, c_nnz),
        ws_chunks,
    )


def _chunk_segment_plans(seg, num_segments, seg_fits, target=2_000_000):
    """Split a SORTED segment map at segment boundaries into VMEM-sized
    chunks, one windowed plan each. Chunk i covers segment ids
    [base_i, base_{i+1}) — empty ids inside a chunk's range sum to zero
    in its kernel, so concatenating the chunk outputs reproduces the
    full segment_sum exactly. Returns [(lo, hi, base, nseg, plan)] or
    None if any chunk still cannot fit (a single monster segment)."""
    from tpusparse.kernels.windowed import windowed_segment_plan

    n_in = int(seg.shape[0])
    nchunk = -(-n_in // target)
    if nchunk <= 1:
        return None
    cuts = [0]
    for i in range(1, nchunk):
        pos = i * n_in // nchunk
        pos = int(np.searchsorted(seg, seg[pos], side="right"))
        cuts.append(min(pos, n_in))
    cuts.append(n_in)
    cuts = sorted(set(cuts))
    bases = [0] + [int(seg[lo]) for lo in cuts[1:-1]] + [int(num_segments)]
    chunks = []
    for (lo, hi), (b0, b1) in zip(
        zip(cuts[:-1], cuts[1:]), zip(bases[:-1], bases[1:])
    ):
        if lo >= hi:
            return None  # degenerate cut (monster segment)
        p = windowed_segment_plan(seg[lo:hi] - b0, b1 - b0)
        if not seg_fits(p, hi - lo):
            return None
        chunks.append((lo, hi, b0, b1 - b0, p))
    return chunks


def spgemm_plan(a: CSR, b: CSR) -> SpGEMMPlan:
    """Build (or fetch cached) the multiplication schedule for A @ B.

    Host-only: patterns must be concrete (the same contract as
    plan.build_plan — sparsity patterns are trace-time constants
    throughout the framework). Cached by the pair of pattern
    fingerprints, never by object identity.
    """
    if a.shape[1] != b.shape[0]:
        raise ValueError(
            f"spgemm shape mismatch: {a.shape} @ {b.shape} "
            f"(need a.shape[1] == b.shape[0])"
        )
    try:
        a_indptr = np.asarray(a.indptr)
        a_indices = np.asarray(a.indices)
        b_indptr = np.asarray(b.indptr)
        b_indices = np.asarray(b.indices)
    except Exception as e:  # traced pattern
        raise ValueError(
            "spgemm needs concrete sparsity patterns (host inspector); "
            "build the plan outside jit and pass it in"
        ) from e
    key = (
        _fingerprint(a.shape, (1, 1), a_indptr, a_indices),
        _fingerprint(b.shape, (1, 1), b_indptr, b_indices),
    )
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit

    m, _ = a.shape
    n = b.shape[1]

    from tpusparse.runtime import native

    if native.available():
        res = native.spgemm_symbolic(
            a_indptr, a_indices, b_indptr, b_indices, m, n
        )
        if res is None:
            raise ValueError(
                "spgemm schedule exceeds int32 indexing "
                f"(shapes {a.shape} @ {b.shape})"
            )
        c_indptr, c_indices, a_pos, b_pos, c_pos = res
        ws_c, wg_a, wg_b, wg_c, ws_cc = _windowed_schedule_plans(
            a_pos, b_pos, c_pos,
            int(a_indices.shape[0]), int(b_indices.shape[0]),
            int(c_indices.shape[0]),
        )
        plan = SpGEMMPlan(
            a_pos=jnp.asarray(a_pos),
            b_pos=jnp.asarray(b_pos),
            c_pos=jnp.asarray(c_pos),
            c_indices=c_indices,
            c_indptr=c_indptr,
            a_shape=a.shape,
            b_shape=b.shape,
            ws_c=ws_c, wg_a=wg_a, wg_b=wg_b, wg_c=wg_c,
            ws_c_chunks=ws_cc,
        )
        _PLAN_CACHE[key] = plan
        return plan

    a_nnz = int(a_indices.shape[0])
    b_deg = np.diff(b_indptr.astype(np.int64))  # nnz per B row
    per_a = b_deg[a_indices]  # products spawned by each A nonzero
    nmul = int(per_a.sum())
    if nmul >= np.iinfo(_INT).max:
        raise ValueError(
            f"spgemm schedule has {nmul} products — exceeds int32 indexing"
        )
    # a_pos: each A-nonzero repeated by its product count
    a_pos = np.repeat(np.arange(a_nnz, dtype=np.int64), per_a)
    # b_pos: for A-nonzero p with column k, the run b_indptr[k] : b_indptr[k+1]
    first = np.cumsum(per_a) - per_a  # schedule offset of each A-nonzero
    offs = np.arange(nmul, dtype=np.int64) - np.repeat(first, per_a)
    b_pos = np.repeat(b_indptr[a_indices].astype(np.int64), per_a) + offs
    # C coordinates of each product
    a_rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(a_indptr))
    flat = a_rows[a_pos] * np.int64(n) + b_indices[b_pos]
    uniq, inv = np.unique(flat, return_inverse=True)  # sorted == CSR order
    c_nnz = int(uniq.shape[0])
    # sort the schedule by destination slot so the device accumulation is
    # a sorted segment-sum (no scatter sort/hash pass)
    order = np.argsort(inv, kind="stable")
    a_pos, b_pos, c_pos = a_pos[order], b_pos[order], inv[order]
    c_rows = (uniq // n).astype(np.int64)
    c_indptr = np.zeros(m + 1, dtype=_INT)
    c_indptr[1:] = np.cumsum(np.bincount(c_rows, minlength=m)).astype(_INT)
    ws_c, wg_a, wg_b, wg_c, ws_cc = _windowed_schedule_plans(
        a_pos, b_pos, c_pos, a_nnz, int(b_indices.shape[0]), c_nnz
    )
    plan = SpGEMMPlan(
        a_pos=jnp.asarray(a_pos.astype(_INT)),
        b_pos=jnp.asarray(b_pos.astype(_INT)),
        c_pos=jnp.asarray(c_pos.astype(_INT)),
        c_indices=(uniq % n).astype(_INT),
        c_indptr=c_indptr,
        a_shape=a.shape,
        b_shape=b.shape,
        ws_c=ws_c, wg_a=wg_a, wg_b=wg_b, wg_c=wg_c,
        ws_c_chunks=ws_cc,
    )
    _PLAN_CACHE[key] = plan
    return plan


@jax.custom_vjp
def _spgemm_data(plan: SpGEMMPlan, a_data, b_data):
    # each index op independently rides its windowed vector-sweep kernel
    # when the plan adopted one (schedule sorted by c_pos -> the segment
    # sum and the vjp's dC gather are the canonical windowed clients)
    from tpusparse.kernels.windowed import windowed_gather, windowed_segment_sum

    av = (
        windowed_gather(a_data, plan.wg_a)
        if plan.wg_a is not None
        else a_data[plan.a_pos]
    )
    bv = (
        windowed_gather(b_data, plan.wg_b)
        if plan.wg_b is not None
        else b_data[plan.b_pos]
    )
    prods = av * bv
    if plan.ws_c is not None:
        return windowed_segment_sum(prods, plan.ws_c)
    if plan.ws_c_chunks is not None:
        return jnp.concatenate([
            windowed_segment_sum(prods[lo:hi], p)
            for (lo, hi, _base, _nseg, p) in plan.ws_c_chunks
        ])
    return jax.ops.segment_sum(
        prods,
        plan.c_pos,
        num_segments=plan.c_nnz,
        indices_are_sorted=True,
    )


def _spgemm_fwd(plan, a_data, b_data):
    return _spgemm_data(plan, a_data, b_data), (plan, a_data, b_data)


def _spgemm_bwd(res, g):
    from tpusparse.kernels.windowed import windowed_gather

    plan, a_data, b_data = res
    gm = (
        windowed_gather(g, plan.wg_c)
        if plan.wg_c is not None
        else g[plan.c_pos]
    )
    av = (
        windowed_gather(a_data, plan.wg_a)
        if plan.wg_a is not None
        else a_data[plan.a_pos]
    )
    bv = (
        windowed_gather(b_data, plan.wg_b)
        if plan.wg_b is not None
        else b_data[plan.b_pos]
    )
    # scatter-adds: a_pos/b_pos are unsorted after the c_pos sort, so no
    # sortedness promise (a false one silently misplaces updates on TPU —
    # see types.CSR.to_dense note)
    da = (
        jnp.zeros_like(a_data)
        .at[plan.a_pos]
        .add((gm * bv).astype(a_data.dtype))
    )
    db = (
        jnp.zeros_like(b_data)
        .at[plan.b_pos]
        .add((gm * av).astype(b_data.dtype))
    )
    from tpusparse.ops import _zeros_tangent

    return _zeros_tangent(plan), da, db


_spgemm_data.defvjp(_spgemm_fwd, _spgemm_bwd)


# Cost-model constants measured on TPU v5e (see benchmarks/RESULTS.md):
# with the windowed accumulation (r4) the schedule executes at ~430M
# products/s, measured consistently from 69k to 6.9M products (0.17 ms /
# 2.42 ms / 15.6 ms) — c_pos is sorted by construction, so the windowed
# segment plan (or its VMEM-chunked form) essentially always adopts and
# the old ~64M/s XLA scalar floor no longer binds. The r3 dense
# crossover (~1% uniform fill at 4096²) moved: schedule 15.6 ms vs
# dense 41.7 ms at that exact point, so dense now wins only past ~4%
# fill where nmul approaches m·k·density² ≈ MXU-pass cost.
_SCHEDULE_MULTS_PER_S = 430e6

# XLA's TPU gather executes ~1 index at a time: ~6.7 ns/element measured
# (flat 1-D form; 2-D fancy indexing is 1.5x worse, sortedness hints are
# ignored) — the dense route pays this once per C nonzero to extract the
# structural slots from the dense product
_GATHER_PER_ELEM = 6.7e-9


def _count_products(a: CSR, b: CSR) -> int:
    """nmul without building the schedule (cheap host pass)."""
    b_deg = np.diff(np.asarray(b.indptr).astype(np.int64))
    return int(b_deg[np.asarray(a.indices)].sum())


def _route_spgemm(a: CSR, b: CSR) -> str:
    from tpusparse.ops import _COST, _load_calibration_into_cost

    _load_calibration_into_cost()
    try:
        nmul = _count_products(a, b)
    except Exception:  # traced pattern — only the schedule path can run
        return "schedule"
    m, k = a.shape
    n = b.shape[1]
    t_sched = nmul / _SCHEDULE_MULTS_PER_S
    # c_nnz is unknown before the pattern build; nmul upper-bounds it and
    # is tight exactly where the dense route competes (few collisions)
    c_nnz_bound = min(nmul, m * n)
    t_dense = (
        2.0 * m * k * n / _COST["dense_fp32_flops"]
        + (a.nnz + b.nnz) * _COST["densify_per_nnz"]
        + c_nnz_bound * _GATHER_PER_ELEM
    )
    return "schedule" if t_sched <= t_dense else "dense"


_PATTERN_CACHE: dict = {}


def _c_pattern(a: CSR, b: CSR):
    """C's CSR pattern only (for the dense route) — scipy boolean product,
    much cheaper than the full multiplication schedule at high fill."""
    ai = (np.asarray(a.indptr), np.asarray(a.indices))
    bi = (np.asarray(b.indptr), np.asarray(b.indices))
    key = (
        _fingerprint(a.shape, (1, 1), ai[0], ai[1]),
        _fingerprint(b.shape, (1, 1), bi[0], bi[1]),
    )
    hit = _PATTERN_CACHE.get(key)
    if hit is not None:
        return hit
    import scipy.sparse as ssp

    sa = ssp.csr_matrix(
        (np.ones(ai[1].size, np.int8), ai[1], ai[0]), shape=a.shape
    )
    sb = ssp.csr_matrix(
        (np.ones(bi[1].size, np.int8), bi[1], bi[0]), shape=b.shape
    )
    pat = (sa.astype(bool) @ sb.astype(bool)).tocsr()
    pat.sort_indices()
    rows = np.repeat(
        np.arange(a.shape[0], dtype=np.int64), np.diff(pat.indptr)
    )
    hit = (
        pat.indices.astype(_INT),
        pat.indptr.astype(_INT),
        rows.astype(_INT),
    )
    _PATTERN_CACHE[key] = hit
    return hit


def spgemm(
    a: CSR, b: CSR, plan: SpGEMMPlan | None = None, method: str = "auto"
) -> CSR:
    """Sparse × sparse matmul: returns C = A @ B as CSR.

    methods: 'schedule' (host-planned gather + windowed sorted
    segment-sum — r4 moved its rate to ~430M products/s, so it now beats
    dense past 1% uniform fill at 4096²), 'dense' (densify both
    operands, one MXU matmul, gather C's structural slots — wins only at
    high fill / tiny operands), 'auto' (cost model
    picks; the SpMM-router philosophy applied to SpGEMM). All methods are
    differentiable in both operands' values and produce the identical
    structural pattern. Pass ``plan`` (forces 'schedule') when calling
    under jit with traced values.
    """
    if plan is not None:
        method = "schedule"
    elif method == "auto":
        method = _route_spgemm(a, b)
    if method == "dense":
        if a.shape[1] != b.shape[0]:
            raise ValueError(
                f"spgemm shape mismatch: {a.shape} @ {b.shape} "
                f"(need a.shape[1] == b.shape[0])"
            )
        from tpusparse import dense

        c_indices, c_indptr, c_rows = _c_pattern(a, b)
        cd = dense.matmul(a.to_dense(), b.to_dense())
        m, n = a.shape[0], b.shape[1]
        if m * n < 2**31 - 1:
            # flat 1-D gather: measured 1.5x faster than 2-D fancy indexing
            flat = c_rows.astype(np.int64) * n + c_indices.astype(np.int64)
            c_data = cd.reshape(-1)[jnp.asarray(flat.astype(np.int32))]
        else:
            c_data = cd[c_rows, c_indices]
        return CSR(
            data=c_data,
            indices=c_indices,
            indptr=c_indptr,
            shape=(m, n),
        )
    if method != "schedule":
        raise ValueError(f"unknown spgemm method {method!r}")
    plan = plan or spgemm_plan(a, b)
    if plan.a_shape != a.shape or plan.b_shape != b.shape:
        raise ValueError(
            f"plan built for {plan.a_shape} @ {plan.b_shape}, "
            f"got {a.shape} @ {b.shape}"
        )
    c_data = _spgemm_data(plan, a.data, b.data)
    # pattern arrays stay host numpy (jnp.asarray under jit would make
    # them traced constants, hiding the pattern from host inspectors)
    return CSR(
        data=c_data,
        indices=plan.c_indices,
        indptr=plan.c_indptr,
        shape=plan.c_shape,
    )


def spgemm_reference(a: CSR, b: CSR) -> np.ndarray:
    """Host fp64 oracle: dense product of the two operands (tests only)."""
    ad = np.asarray(a.to_dense(), dtype=np.float64)
    bd = np.asarray(b.to_dense(), dtype=np.float64)
    return ad @ bd
