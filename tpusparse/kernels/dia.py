"""Wide-DIA SpMV Pallas kernel — x resident in VMEM, per-diagonal shifts.

The XLA formulations of y[i] = Σ_d data[d, i] · x[i + off_d] all lose
badly once the diagonal count is large and the RHS is a single vector
(measured r3 on a 1715-diagonal 32k-row AMG level operator):

  * fully unrolled: O(nd) HLO per matvec — never finished compiling
    inside a CG loop;
  * chunked lax.scan over dynamic slices: 4.4 ms — ~4x the traffic
    bound, per-slice overhead dominated;
  * batched-shift gather (static lane-shift table + vmapped
    dynamic_slice): 11.2 ms — XLA semi-scalarizes the row gather.

r4 redesign (the "sublane-packed shifts" lever the r3 kernel recorded as
future work): the r3 kernel carried everything lane-major — x windows as
(1, 16384), the per-diagonal roll and FMA as (1, mt) sweeps — which puts
ONE sublane of eight to work per vreg, and measured 2.7x above the data
traffic bound. Here x lives in VMEM as 2-D 128-lane chunks
(xp2[c, l] = xp[128c + l]); a diagonal shift s = 128q + r becomes

  * two dynamic SUBLANE slices of xp2 at rows q and q+1 (sublane-dim
    dynamic starts are legal; the LANE dim needs 128-aligned starts,
    which is the whole reason the r3 kernel rolled),
  * two 128-lane `pltpu.roll`s by the sub-128 remainder r plus one
    lane-iota select to stitch the chunk boundary,

and the FMA accumulates over (mt/128, 128) blocks — full 8/8 sublane
occupancy on every VPU op.

Mosaic caveat (measured on v5e): dynamic-shift `pltpu.roll` SILENTLY
CORRUPTS results unless the rolled lane width is a POWER OF TWO (a
constant phantom offset at 129/388-tile widths; pow2 widths including
the 1-tile 128-lane rolls used here are parity-checked exact on the
real chip at the real operator widths — tests/test_dia.py + the r4
on-chip parity drive recorded in benchmarks/RESULTS.md).
"""

from __future__ import annotations

import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.utils.config import get_config, interpret_mode, round_up

__all__ = ["dia_spmv_pallas", "PackedDIA", "pack_dia_operator"]

_DU = 8       # diagonals per grid cell
_MT = 16384   # output tile (mt/128 = 128 chunk rows per seg)


def _dia_spmv_kernel(starts_ref, data_ref, xp_ref, o_ref, acc_scr,
                     sh_scr, last_r, *, nd: int, mt: int):
    # Diagonals arrive SORTED BY LANE REMAINDER r = start % 128
    # (_pack_dia): on first use of each r this kernel builds the shifted
    # whole-x copy sh[q, l] = xp[128q + l + r] once (two lane rolls + a
    # sublane roll + one select over the resident x), and every diagonal
    # then consumes a bare dynamic sublane slice of it. The former
    # per-diagonal 2-rolls+select were the kernel's VPU bound (r4
    # stripped audit). sh persists across grid cells; last_r tracks the
    # group (t·mt is a multiple of 128, so r is t-independent).
    t = pl.program_id(0)
    g = pl.program_id(1)
    ng = pl.num_programs(1)
    rows = mt // 128
    nrows = sh_scr.shape[0]

    @pl.when((t == 0) & (g == 0))
    def _():
        last_r[0] = -1

    @pl.when(g == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    lane_full = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)

    for u in range(_DU):
        idx = g * _DU + u

        @pl.when(idx < nd)
        def _(u=u, idx=idx):
            w0 = starts_ref[idx] + t * mt
            q = w0 // 128
            r = w0 - q * 128

            @pl.when(r != last_r[0])
            def _():
                xa = xp_ref[:]
                # row q <- row q+1 (cyclic backward-by-1 == forward by
                # nrows-1; pltpu.roll rejects negative static shifts)
                xdown = pltpu.roll(xa, nrows - 1, 0)
                ra = pltpu.roll(xa, -r, 1)
                rb = pltpu.roll(xdown, -r, 1)
                # the sublane wrap writes garbage into sh's LAST row
                # only; _pack_dia's +256 slack keeps every slice below it
                sh_scr[:] = jnp.where(lane_full < 128 - r, ra, rb)
                last_r[0] = r

            acc_scr[:] = acc_scr[:] + data_ref[u] * sh_scr[pl.ds(q, rows), :]

    @pl.when(g == ng - 1)
    def _():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mq", "mt", "nd", "span_lo", "wp"))
def _dia_spmv_jit(data3, starts, x, *, mq, mt, nd, span_lo, wp):
    xp2 = (
        jnp.zeros((wp,), x.dtype)
        .at[span_lo:span_lo + x.shape[0]]
        .set(x)
        .reshape(wp // 128, 128)
    )
    nmt = mq // mt
    rows = mt // 128
    ng = data3.shape[0] // _DU
    out = pl.pallas_call(
        functools.partial(_dia_spmv_kernel, nd=nd, mt=mt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nmt, ng),
            in_specs=[
                pl.BlockSpec((_DU, rows, 128), lambda t, g, starts: (g, t, 0)),
                # whole padded x resident as 2-D chunks (random sublane
                # access; direct HBM-ref loads do not lower)
                pl.BlockSpec((wp // 128, 128), lambda t, g, starts: (0, 0)),
            ],
            out_specs=pl.BlockSpec((rows, 128), lambda t, g, starts: (t, 0)),
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((wp // 128, 128), x.dtype),  # shifted x
                pltpu.SMEM((1,), jnp.int32),  # last built remainder
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((mq // 128, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # g-cells share the accumulator scratch per m-tile
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=get_config().vmem_limit_bytes,
        ),
        interpret=interpret_mode(),
    )(starts, data3, xp2)
    return out.reshape(-1)


def _pack_dia(data, offsets: np.ndarray, k: int):
    """Sort/pad/chunk the diagonal data into the kernel's layout.

    Returns (data3 (ndp, mq/128, 128), starts (nd,) i32 jnp, meta dict).
    The pad+reshape is a full copy of the (often hundreds-of-MB) data
    array — measured 1.3 ms of a 2.0 ms call when it ran inside the
    per-matvec jit — so `dia_spmv_pallas` runs it ONCE per concrete data
    array via a weak cache (jax arrays are immutable, so identity-keyed
    caching of a pure function of the array is sound; tracers skip it).
    """
    nd, m = data.shape
    lo0 = int(max(0, -offsets.min(initial=0)))
    # sort by LANE REMAINDER (then offset): diagonals sharing
    # (offset + lo) % 128 read the same lane-rotation of x, so the
    # kernel builds ONE shifted copy of the whole x per remainder group
    # and every diagonal in the group is a bare sublane slice + FMA —
    # the per-diagonal 2-rolls+select were the kernel's measured VPU
    # bound (r4 stripped audit: 0.37 -> 0.71 ms of 1.67)
    order = np.lexsort((offsets, (offsets + lo0) % 128))
    if not np.array_equal(order, np.arange(nd)):
        offsets = offsets[order]
        data = jnp.asarray(data)[np.asarray(order)]
    lo = int(max(0, -offsets.min(initial=0)))
    hi = int(max(0, offsets.max(initial=0) + m - k))
    # m-tile: multiple of 1024 so seg blocks are (8k, 128) sublane-legal,
    # capped at _MT (128 chunk rows per tile)
    mt = min(_MT, round_up(m, 1024))
    mq = round_up(m, mt)  # whole m-tiles
    ng = -(-nd // _DU)
    dpad = ng * _DU - nd
    data = jnp.asarray(data)
    if mq != m or dpad:
        data = jnp.pad(data, ((0, dpad), (0, mq - m)))
    # data chunked to the seg layout: data3[d, c, l] = data[d, 128c + l]
    data3 = data.reshape(data.shape[0], mq // 128, 128)
    # xp[lo + j] = x[j]; the deepest in-kernel chunk read is row
    # (w0_max // 128) + 1 + mt/128, w0_max = lo + off_max + mq - mt
    wp = round_up(lo + int(offsets.max(initial=0)) + mq + 256, 128)
    wp = max(wp, round_up(lo + k + hi + 256, 128))
    starts = jnp.asarray((offsets + lo).astype(np.int32))
    meta = dict(mq=mq, mt=mt, nd=nd, span_lo=lo, wp=wp)
    return data3, starts, meta


# id-keyed (jax.Array is IMMUTABLE but not hashable, so WeakKeyDictionary
# cannot hold it — probed); a weakref.finalize evicts the entry when the
# array is collected, which also makes id reuse safe (the callback runs
# at free, before the id can be handed out again)
_PACK_CACHE: dict = {}


def _pack_cache_for(data):
    ident = id(data)
    hit = _PACK_CACHE.get(ident)
    if hit is not None:
        return hit
    sub: dict = {}
    try:
        weakref.finalize(data, _PACK_CACHE.pop, ident, None)
    except TypeError:  # not weak-referenceable
        return None
    _PACK_CACHE[ident] = sub
    return sub


def dia_spmv_pallas(data: jnp.ndarray, offsets, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x for DIA A (data (nd, m), concrete offsets) and x (k,).

    Same value convention as `ops.dia_spmm`: data[d, i] multiplies
    x[i + offsets[d]]. Out-of-range positions contribute zero."""
    offsets = np.asarray(offsets).astype(np.int64)
    nd, m = data.shape
    if offsets.shape[0] != nd:
        raise ValueError(f"offsets {offsets.shape} != data rows {nd}")
    if x.ndim != 1:
        raise ValueError(f"dia_spmv_pallas takes a 1-D x, got {x.shape}")
    k = int(x.shape[0])
    concrete = isinstance(data, jax.Array) and not isinstance(
        data, jax.core.Tracer
    )
    if concrete:
        sub = _pack_cache_for(data)
        key = (offsets.tobytes(), k)
        packed = sub.get(key) if sub is not None else None
        if packed is None:
            packed = _pack_dia(data, offsets, k)
            if sub is not None:
                sub[key] = packed
    else:
        packed = _pack_dia(jnp.asarray(data), offsets, k)
    data3, starts, meta = packed
    out = _dia_spmv_jit(data3, starts, x, **meta)
    return out[:m]


# ---------------------------------------------------------------------------
# Differentiable wrapper: the Pallas kernel carries a custom VJP whose
# backward runs the (slower, jax-native) scan formulation — AD through
# wide-DIA SpMV stays correct while the hot primal path keeps the kernel.
# ---------------------------------------------------------------------------


def _dia_spmv_scan_ref(offsets_t, data, x):
    """jax-differentiable reference: chunked scan over dynamic slices
    (the pre-kernel formulation)."""
    offsets = np.asarray(offsets_t, np.int64)
    nd, m = data.shape
    lo = int(max(0, -offsets.min(initial=0)))
    hi = int(max(0, offsets.max(initial=0) + m - x.shape[0]))
    xp = jnp.pad(x, (lo, hi))[:, None]
    U = 32
    pad = (-nd) % U
    offs_p = offsets + lo
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        offs_p = np.concatenate([offs_p, np.full(pad, lo, np.int64)])
    starts = jnp.asarray(offs_p.reshape(-1, U).astype(np.int32))
    chunks = data.reshape(-1, U, data.shape[1])
    acc = jnp.zeros((m, 1), jnp.promote_types(data.dtype, x.dtype))

    def step(carry, xs):
        st, dc = xs
        for u in range(U):
            seg = jax.lax.dynamic_slice_in_dim(xp, st[u], m, axis=0)
            carry = carry + dc[u][:, None] * seg
        return carry, None

    acc, _ = jax.lax.scan(step, acc, (starts, chunks))
    return acc[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dia_spmv_vjp(offsets_t, data, x):
    return dia_spmv_pallas(data, np.asarray(offsets_t, np.int64), x)


def _dia_spmv_fwd(offsets_t, data, x):
    return _dia_spmv_vjp(offsets_t, data, x), (data, x)


def _dia_spmv_bwd(offsets_t, res, g):
    data, x = res
    _, pull = jax.vjp(lambda d, v: _dia_spmv_scan_ref(offsets_t, d, v),
                      data, x)
    return pull(g)


_dia_spmv_vjp.defvjp(_dia_spmv_fwd, _dia_spmv_bwd)


def dia_spmv(data: jnp.ndarray, offsets, x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable wide-DIA SpMV: Pallas kernel forward, scan-reference
    backward. `offsets` must be concrete."""
    return _dia_spmv_vjp(tuple(int(o) for o in np.asarray(offsets)), data, x)


# ---------------------------------------------------------------------------
# PackedDIA — a wide-DIA operator stored permanently in the KERNEL layout.
#
# Why it exists (r4, found the hard way): a jitted program embeds every
# closed-over array as an HLO LITERAL, and the axon tunnel rejects
# compile payloads past ~100 MB — laplace3d_64's L1 DIA plane alone is
# ~200 MB, so an AMG hierarchy holding plain `DIA` levels cannot be
# closed over at all. Passing the hierarchy as a jit ARGUMENT fixes the
# literal, but then `dia_spmv_pallas` sees a TRACER and re-runs the
# pad/reshape pack INSIDE the trace — a full copy of the plane per
# matvec that XLA does not hoist out of loop bodies (measured 1.3 ms of
# a 2.0 ms call). PackedDIA resolves both: the packed (ndp, mq/128, 128)
# plane IS the pytree leaf, the kernel's static geometry rides aux, so
# the operator works as a jit argument with zero per-call packing.
# ---------------------------------------------------------------------------


class PackedDIA:
    """Wide-DIA matvec operator in kernel layout; registered pytree.

    Leaves: `data3` (the packed diagonal plane). Aux (static): sorted
    integer `offsets_t`, `shape`, kernel meta. Same value convention as
    `types.DIA` / `ops.dia_spmm`.
    """

    def __init__(self, data3, offsets_t, shape, meta):
        self.data3 = data3
        self.offsets_t = tuple(int(o) for o in offsets_t)
        self.shape = tuple(shape)
        self.meta = tuple(meta)  # (mq, mt, nd, span_lo, wp)

    @property
    def offsets(self) -> np.ndarray:  # report()/introspection parity w/ DIA
        return np.asarray(self.offsets_t, np.int64)

    @property
    def dtype(self):
        return self.data3.dtype

    def unpack_data(self) -> jnp.ndarray:
        """The original (nd, m) diagonal plane (a copy; in-trace safe)."""
        nd, m = self.meta[2], self.shape[0]
        return self.data3.reshape(self.data3.shape[0], -1)[:nd, :m]

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 1:
            return _packed_dia_mv(
                (self.offsets_t, self.meta, self.shape), self.data3, x
            )
        # Multivector fallback: unpack in-trace (one copy) and run the
        # chunked-scan SpMM — wide-DIA multivector work is off the
        # kernel's (VMEM-resident x) design point anyway. The plane rows
        # ride in LANE-REMAINDER order (the kernel's shifted-x grouping);
        # types.DIA wants offsets sorted, so re-sort here.
        from tpusparse import ops as _ops
        from tpusparse.types import DIA as _DIA

        offs = self.offsets
        order = np.argsort(offs)
        return _ops.dia_spmm(
            _DIA(data=self.unpack_data()[jnp.asarray(order)],
                 offsets=offs[order], shape=self.shape),
            x,
        )

    def __call__(self, x):
        return self.mv(x)


def _packed_flatten(p: PackedDIA):
    return (p.data3,), (p.offsets_t, p.shape, p.meta)


def _packed_unflatten(aux, leaves):
    return PackedDIA(leaves[0], aux[0], aux[1], aux[2])


jax.tree_util.register_pytree_node(
    PackedDIA, _packed_flatten, _packed_unflatten
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _packed_dia_mv(static, data3, x):
    offsets_t, (mq, mt, nd, span_lo, wp), (m, k) = static
    starts = jnp.asarray(
        (np.asarray(offsets_t, np.int64) + span_lo).astype(np.int32)
    )
    return _dia_spmv_jit(
        data3, starts, x, mq=mq, mt=mt, nd=nd, span_lo=span_lo, wp=wp
    )[:m]


def _packed_dia_fwd(static, data3, x):
    return _packed_dia_mv(static, data3, x), (data3, x)


def _packed_dia_bwd(static, res, g):
    offsets_t, (mq, mt, nd, span_lo, wp), (m, k) = static
    data3, x = res
    data = data3.reshape(data3.shape[0], -1)[:nd, :m]
    _, pull = jax.vjp(
        lambda d, v: _dia_spmv_scan_ref(offsets_t, d, v), data, x
    )
    dd, dx = pull(g)
    dd = jnp.pad(dd, ((0, data3.shape[0] - nd), (0, mq - m)))
    return dd.reshape(data3.shape), dx


_packed_dia_mv.defvjp(_packed_dia_fwd, _packed_dia_bwd)


def pack_dia_operator(data, offsets, shape) -> PackedDIA:
    """Build a PackedDIA from a (nd, m) diagonal plane + concrete offsets.

    Runs the pack ONCE, eagerly (call at setup time with concrete data —
    this is the point). `shape` is the operator's (m, k)."""
    offsets = np.asarray(offsets, np.int64)
    k = int(shape[1])
    data3, starts, meta = _pack_dia(jnp.asarray(data), offsets, k)
    return PackedDIA(
        data3,
        # offsets in the PLANE's row order (_pack_dia permutes by lane
        # remainder) — recovered from the kernel starts, never re-sorted
        np.asarray(starts, np.int64) - meta["span_lo"],
        shape,
        (meta["mq"], meta["mt"], meta["nd"], meta["span_lo"], meta["wp"]),
    )
