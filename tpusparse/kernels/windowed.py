"""Windowed gather / segment-sum Pallas kernels — index ops with locality.

XLA lowers arbitrary `x[idx]` gathers and segment sums to scalar-grain
index ops pinned at ~15 ns/element on TPU (measured flat from 50k to 4M
indices; the VPU has no vector-gather instruction). But when the index
map has LOCALITY — every 128-element span of `idx` reads from a bounded
window of the table — the gather is expressible as vector compare/select
against a window slice, which the VPU executes at lane rate:

    out[s, l] = sum_j [rel[s, l] == j] * table[start[s] + j],  j < W

Per 8x128 output block the kernel slices eight (lane-aligned) windows of
the VMEM-resident table and sweeps them in 128-wide chunks with a 3-D
masked reduce — ~3·W/1024 cycles per element instead of ~15 ns, a
10-20x win for W ≤ 512 (measured in RESULTS.md r3).

The canonical client is AMG's factored prolongator (`amg._FactoredP`):
its `e[agg]` expand and `segment_sum(y, agg)` reduce at the 1M-row fine
level were 16.5 ms of a 20 ms V-cycle, and aggregation maps are local by
construction (lexicographic roots). Host planners measure the actual
spread, choose W, and split the (rare) far entries into an exception COO
handled by the stock XLA ops — so the kernels are EXACT for any index
map, just fastest for local ones. No reference analog (CUDA warps
shuffle; the TPU answer is windows + lanes).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.utils.config import get_config, interpret_mode, round_up

__all__ = [
    "WindowedGatherPlan",
    "WindowedSegmentPlan",
    "windowed_gather_plan",
    "windowed_gather",
    "windowed_segment_plan",
    "windowed_segment_sum",
    "modeled_cost_s",
    "xla_index_cost_s",
]

_SPAN = 128          # indices per sublane-row span (one window each)
_BLOCK_SPANS = 8     # spans per grid cell -> (8, 128) output blocks
_CHUNK_COST_S = 50e-9  # measured per span-chunk sweep cost (v5e r3:
#                        1M-gather at W=512 = 1.6 ms over 32768 chunks)
_EXC_COST_S = 20e-9    # per-element XLA exception-path cost


def modeled_cost_s(plan) -> float:
    """Projected kernel time (s) for a windowed plan — the span sweeps
    plus the exception path; callers compare against `xla_index_cost_s`
    before adopting a plan."""
    return (
        plan.starts.size * (plan.window // _SPAN) * _CHUNK_COST_S
        + plan.exc_pos.size * _EXC_COST_S
    )


def xla_index_cost_s(n: int) -> float:
    """Projected XLA gather/segment-sum time: ~10 ns/element (the
    measured 15 ns floor, discounted for nearly-sorted index maps)."""
    return n * 10e-9


def _pick_window(widths: np.ndarray, nspan: int, cap: int) -> int:
    """Window minimizing modeled cost: every span sweeps W/128 chunks,
    entries beyond W ride the scalar exception path. Explicit argmin —
    quantile heuristics mis-size W when one outlier span dominates few
    spans."""
    flat = np.sort(widths.reshape(-1))
    cand = np.arange(1, max(int(cap) // _SPAN, 1) + 1) * _SPAN
    exc = flat.size - np.searchsorted(flat, cand, side="right")
    cost = nspan * (cand // _SPAN) * _CHUNK_COST_S + exc * _EXC_COST_S
    return int(cand[int(np.argmin(cost))])


@dataclass(frozen=True, eq=False)  # id-hash: plans ride jit aux/static args
class WindowedGatherPlan:
    """Host plan for out = table[idx] with per-span windows."""

    idx: np.ndarray         # (n,) original indices (vjp + fallbacks)
    starts: np.ndarray      # (nspan,) int32, 128-aligned window starts
    rel: np.ndarray         # (nb, 8, 128) int32, idx - start (W marks pad)
    exc_pos: np.ndarray     # (ne,) int64 positions handled by XLA gather
    exc_idx: np.ndarray     # (ne,) int32 their table indices
    n: int                  # logical output length
    table_len: int          # logical table length
    window: int             # W, multiple of 128
    nb: int                 # grid size

    @property
    def exception_fraction(self) -> float:
        return self.exc_pos.size / max(self.n, 1)


def windowed_gather_plan(
    idx, table_len: int, cap: int = 2048
) -> WindowedGatherPlan:
    """Plan out = table[idx] (idx (n,) int, concrete host array).

    W = the per-128-span spread rounded up to 128, capped at `cap`;
    entries outside their span's window become exceptions (XLA gather).
    A plan is always returned — callers check `exception_fraction` (or
    `windowed_worthwhile`) to decide whether to use it.
    """
    idx = np.asarray(idx)
    n = idx.shape[0]
    npad = round_up(max(n, 1), _SPAN * _BLOCK_SPANS)
    nspan = npad // _SPAN
    nb = nspan // _BLOCK_SPANS
    ip = np.zeros(npad, idx.dtype)
    ip[:n] = idx
    ip[n:] = idx[-1] if n else 0
    spans = ip.reshape(nspan, _SPAN).astype(np.int64)
    lo = spans.min(axis=1)
    start = np.maximum(lo - (lo % _SPAN), 0).astype(np.int64)  # 128-aligned
    rel = spans - start[:, None]
    W = _pick_window(rel + 1, nspan, cap) if n else _SPAN
    inside = rel < W
    # exceptions: positions whose index falls outside the window
    flat_in = inside.reshape(-1)[:n]
    exc_pos = np.flatnonzero(~flat_in).astype(np.int64)
    exc_idx = idx[exc_pos].astype(np.int32)
    rel = np.where(inside, rel, W)  # pad marker: selects nothing
    return WindowedGatherPlan(
        idx=idx.astype(np.int32),
        starts=start.astype(np.int32),
        rel=rel.reshape(nb, _BLOCK_SPANS, _SPAN).astype(np.int32),
        exc_pos=exc_pos,
        exc_idx=exc_idx,
        n=n,
        table_len=int(table_len),
        window=W,
        nb=nb,
    )


def _gather_kernel(starts_ref, rel_ref, table_ref, out_ref, win_scr, *,
                   window: int):
    b = pl.program_id(0)
    # eight lane-aligned window slices of the resident table
    for s in range(_BLOCK_SPANS):
        st = pl.multiple_of(starts_ref[b * _BLOCK_SPANS + s], _SPAN)
        win_scr[s, :] = table_ref[0, pl.ds(st, window)]
    rel = rel_ref[0]
    acc = jnp.zeros((_BLOCK_SPANS, _SPAN), jnp.float32)
    for c in range(window // _SPAN):
        jbase = c * _SPAN
        j = jbase + jax.lax.broadcasted_iota(
            jnp.int32, (_BLOCK_SPANS, _SPAN, _SPAN), 2
        )
        m = rel[:, :, None] == j
        win_c = win_scr[:, jbase:jbase + _SPAN]
        acc = acc + jnp.sum(
            jnp.where(m, win_c[:, None, :].astype(jnp.float32), 0.0), axis=2
        )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "table_len", "window", "nb"))
def _windowed_gather_jit(table, rel, starts, exc_pos, exc_idx, *, n,
                         table_len, window, nb):
    tpad = round_up(table_len + window + _SPAN, _SPAN)
    t2 = jnp.zeros((1, tpad), table.dtype).at[0, :table_len].set(table)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (1, _BLOCK_SPANS, _SPAN), lambda b, starts: (b, 0, 0)
                ),
                # whole table VMEM-resident: in-kernel window slices are
                # VMEM->VMEM (direct HBM-ref loads do not lower)
                pl.BlockSpec((1, tpad), lambda b, starts: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, _BLOCK_SPANS, _SPAN), lambda b, starts: (b, 0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((_BLOCK_SPANS, window), table.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, _BLOCK_SPANS, _SPAN), table.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=get_config().vmem_limit_bytes,
        ),
        interpret=interpret_mode(),
    )(starts, rel, t2)
    out = out.reshape(-1)[:n]
    if exc_pos.shape[0]:
        out = out.at[exc_pos].set(table[exc_idx])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def windowed_gather(table: jnp.ndarray, plan: WindowedGatherPlan) -> jnp.ndarray:
    """out = table[idx] for the planned idx; exact for any index map.

    Differentiable in `table` (vjp = XLA segment-sum over the original
    indices — correctness path; plan a windowed_segment_plan and call
    windowed_segment_sum yourself on the hot path)."""
    if table.ndim != 1:
        raise ValueError(f"windowed_gather takes a 1-D table, got {table.shape}")
    if table.shape[0] != plan.table_len:
        raise ValueError(
            f"table length {table.shape[0]} != plan's {plan.table_len}"
        )
    return _windowed_gather_jit(
        table,
        jnp.asarray(plan.rel),
        jnp.asarray(plan.starts),
        jnp.asarray(plan.exc_pos),
        jnp.asarray(plan.exc_idx),
        n=plan.n,
        table_len=plan.table_len,
        window=plan.window,
        nb=plan.nb,
    )


def _wg_fwd(table, plan):
    return windowed_gather(table, plan), None


def _wg_bwd(plan, _, g):
    return (
        jax.ops.segment_sum(
            g, jnp.asarray(plan.idx), num_segments=plan.table_len
        ),
    )


windowed_gather.defvjp(_wg_fwd, _wg_bwd)


# ---------------------------------------------------------------------------
# Windowed segment sum — the transpose: out[a] = sum_{i: seg[i]==a} y[i]
# ---------------------------------------------------------------------------


@dataclass(frozen=True, eq=False)
class WindowedSegmentPlan:
    seg: np.ndarray         # (n_in,) original segment ids (vjp + fallbacks)
    starts: np.ndarray      # (nspan,) int32, 128-aligned y-window starts
    seg_masked: np.ndarray  # (n_in,) int32: segment ids, -1 on exceptions
    exc_pos: np.ndarray     # (ne,) int64 y positions for the XLA path
    exc_seg: np.ndarray     # (ne,) int32 their segment ids
    mask: np.ndarray        # (n_in,) bool — y entries handled by the kernel
    n_in: int
    num_segments: int
    window: int
    nb: int

    @property
    def exception_fraction(self) -> float:
        return self.exc_pos.size / max(self.n_in, 1)


def windowed_segment_plan(
    seg, num_segments: int, cap: int = 4096
) -> WindowedSegmentPlan:
    """Plan segment_sum(y, seg) where each 128-segment span draws its
    contributions from a bounded window of y. Requires seg concrete."""
    seg = np.asarray(seg).astype(np.int64)
    n_in = seg.shape[0]
    npad = round_up(max(num_segments, 1), _SPAN * _BLOCK_SPANS)
    nspan = npad // _SPAN
    nb = nspan // _BLOCK_SPANS
    # y-window per 128-output span: [min, max] position of contributions
    first = np.full(npad, n_in, np.int64)
    last = np.full(npad, -1, np.int64)
    np.minimum.at(first, seg, np.arange(n_in))
    np.maximum.at(last, seg, np.arange(n_in))
    f_span = first.reshape(nspan, _SPAN).min(axis=1)
    l_span = last.reshape(nspan, _SPAN).max(axis=1)
    f_span = np.where(f_span > l_span, 0, f_span)  # empty spans
    l_span = np.maximum(l_span, f_span)
    start = np.maximum(f_span - (f_span % _SPAN), 0)
    # widths: each y entry's offset within its segment-span's window
    span_of = seg // _SPAN
    widths = np.arange(n_in) - start[span_of] + 1
    W = _pick_window(widths[widths > 0], nspan, cap) if n_in else _SPAN
    # kernel handles y positions inside their segment-span's window
    span_of_seg = seg // _SPAN
    pos = np.arange(n_in)
    inside = (pos >= start[span_of_seg]) & (pos < start[span_of_seg] + W)
    exc_pos = np.flatnonzero(~inside).astype(np.int64)
    exc_seg = seg[exc_pos].astype(np.int32)
    return WindowedSegmentPlan(
        seg=seg.astype(np.int32),
        starts=start.astype(np.int32),
        seg_masked=np.where(inside, seg, -1).astype(np.int32),
        exc_pos=exc_pos,
        exc_seg=exc_seg,
        mask=inside,
        n_in=n_in,
        num_segments=int(num_segments),
        window=W,
        nb=nb,
    )


def _segsum_kernel(starts_ref, seg_ref, y_ref, out_ref, segw_scr, yw_scr, *,
                   window: int):
    b = pl.program_id(0)
    for s in range(_BLOCK_SPANS):
        st = pl.multiple_of(starts_ref[b * _BLOCK_SPANS + s], _SPAN)
        segw_scr[s, :] = seg_ref[0, pl.ds(st, window)]
        yw_scr[s, :] = y_ref[0, pl.ds(st, window)]
    # out ids of this block: global segment index per (sublane, lane)
    base = (b * _BLOCK_SPANS) * _SPAN
    out_id = base + jax.lax.broadcasted_iota(
        jnp.int32, (_BLOCK_SPANS, _SPAN), 0
    ) * _SPAN + jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_SPANS, _SPAN), 1)
    acc = jnp.zeros((_BLOCK_SPANS, _SPAN), jnp.float32)
    for c in range(window // _SPAN):
        jbase = c * _SPAN
        seg_c = segw_scr[:, jbase:jbase + _SPAN]
        y_c = yw_scr[:, jbase:jbase + _SPAN]
        m = out_id[:, :, None] == seg_c[:, None, :]
        acc = acc + jnp.sum(
            jnp.where(m, y_c[:, None, :].astype(jnp.float32), 0.0), axis=2
        )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_in", "num_segments", "window", "nb")
)
def _windowed_segsum_jit(y, seg_masked, mask, starts, exc_pos, exc_seg, *,
                         n_in, num_segments, window, nb):
    npad = round_up(n_in + window + _SPAN, _SPAN)
    y2 = jnp.zeros((1, npad), y.dtype).at[0, :n_in].set(
        jnp.where(mask, y, jnp.zeros((), y.dtype))
    )
    s2 = jnp.full((1, npad), -1, jnp.int32).at[0, :n_in].set(seg_masked)
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, window=window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, npad), lambda b, starts: (0, 0)),
                pl.BlockSpec((1, npad), lambda b, starts: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, _BLOCK_SPANS, _SPAN), lambda b, starts: (b, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((_BLOCK_SPANS, window), jnp.int32),
                pltpu.VMEM((_BLOCK_SPANS, window), y.dtype),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nb, _BLOCK_SPANS, _SPAN), y.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=get_config().vmem_limit_bytes,
        ),
        interpret=interpret_mode(),
    )(starts, s2, y2)
    out = out.reshape(-1)[:num_segments]
    if exc_pos.shape[0]:
        out = out + jax.ops.segment_sum(
            y[exc_pos], exc_seg, num_segments=num_segments
        )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def windowed_segment_sum(
    y: jnp.ndarray, plan: WindowedSegmentPlan
) -> jnp.ndarray:
    """segment_sum(y, seg) for the planned seg; exact for any map.
    Differentiable in `y` (vjp = XLA gather over the original ids)."""
    if y.ndim != 1 or y.shape[0] != plan.n_in:
        raise ValueError(f"y shape {y.shape} != plan n_in {plan.n_in}")
    return _windowed_segsum_jit(
        y,
        jnp.asarray(plan.seg_masked),
        jnp.asarray(plan.mask),
        jnp.asarray(plan.starts),
        jnp.asarray(plan.exc_pos),
        jnp.asarray(plan.exc_seg),
        n_in=plan.n_in,
        num_segments=plan.num_segments,
        window=plan.window,
        nb=plan.nb,
    )


def _ws_fwd(y, plan):
    return windowed_segment_sum(y, plan), None


def _ws_bwd(plan, _, g):
    return (g[jnp.asarray(plan.seg)],)


windowed_segment_sum.defvjp(_ws_fwd, _ws_bwd)
