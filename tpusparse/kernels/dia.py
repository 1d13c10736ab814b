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

Here the padded x lives ONCE in VMEM (m + span fp32 — a few hundred KB)
and each (m-tile, diagonal) cell takes a 128-ALIGNED dynamic lane slice
of it plus a sub-128 `pltpu.roll`; the only large stream is the diagonal
data itself, so the kernel runs at the data-traffic bound.

Mosaic caveat (measured on v5e): dynamic-shift `pltpu.roll` SILENTLY
CORRUPTS results unless the rolled vector's lane width is a POWER OF
TWO (a constant phantom offset appears at 129- and 388-tile widths;
512..32768 lanes = 4..256 tiles are exact). Hence the m-tiling and the
pow2 window: rolls act on (1, WIN) windows with WIN = 2^k >= mt + 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.utils.config import get_config, interpret_mode, round_up

__all__ = ["dia_spmv_pallas"]

_DU = 8       # diagonals per grid cell
_MT = 16256   # output tile; mt + 128 = 16384 = pow2 roll window


def _dia_spmv_kernel(starts_ref, data_ref, xp_ref, o_ref, acc_scr,
                     win_scr, al_scr, *, nd: int, mt: int, win: int):
    t = pl.program_id(0)
    g = pl.program_id(1)
    ng = pl.num_programs(1)

    @pl.when(g == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        al_scr[0] = -1  # force a window load for the first diagonal

    for u in range(_DU):
        idx = g * _DU + u

        @pl.when(idx < nd)
        def _(u=u, idx=idx):
            # out positions [t·mt, t·mt+mt) read xp[st + t·mt + i].
            # Diagonals arrive SORTED by start, so consecutive ones
            # usually share the 128-aligned window — cache it in
            # scratch and reload only when the aligned base moves
            # (~50 diagonals per reload on AMG coarse operators).
            w0 = starts_ref[idx] + t * mt
            al = pl.multiple_of((w0 // 128) * 128, 128)

            @pl.when(al != al_scr[0])
            def _():
                win_scr[:] = xp_ref[0:1, pl.ds(al, win)]
                al_scr[0] = al

            seg = pltpu.roll(win_scr[:], -(w0 - al), 1)[:, :mt]
            acc_scr[0:1, :] = acc_scr[0:1, :] + data_ref[u:u + 1, :] * seg

    @pl.when(g == ng - 1)
    def _():
        o_ref[:] = acc_scr[0:1, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mq", "nd", "span_lo", "wp"))
def _dia_spmv_jit(data, starts, x, *, mq, nd, span_lo, wp):
    xp = jnp.zeros((1, wp), x.dtype).at[0, span_lo:span_lo + x.shape[0]].set(x)
    ng = -(-nd // _DU)
    dpad = ng * _DU - nd
    if dpad:
        data = jnp.pad(data, ((0, dpad), (0, 0)))
    mt = min(_MT, mq)
    nmt = mq // mt
    win = 1
    while win < mt + 128:
        win <<= 1
    out = pl.pallas_call(
        functools.partial(_dia_spmv_kernel, nd=nd, mt=mt, win=win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nmt, ng),
            in_specs=[
                pl.BlockSpec((_DU, mt), lambda t, g, starts: (g, t)),
                pl.BlockSpec((1, wp), lambda t, g, starts: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, mt), lambda t, g, starts: (0, t)),
            scratch_shapes=[
                pltpu.VMEM((8, mt), jnp.float32),
                pltpu.VMEM((1, win), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, mq), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # g-cells share the accumulator scratch per m-tile
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=get_config().vmem_limit_bytes,
        ),
        interpret=interpret_mode(),
    )(starts, data, xp)
    return out[0]


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
    order = np.argsort(offsets)
    if not np.array_equal(order, np.arange(nd)):
        offsets = offsets[order]
        data = data[np.asarray(order)]
    lo = int(max(0, -offsets.min(initial=0)))
    hi = int(max(0, offsets.max(initial=0) + m - x.shape[0]))
    mq = round_up(m, 128)
    mq = round_up(mq, min(_MT, mq))  # whole m-tiles
    if mq != m:
        data = jnp.pad(data, ((0, 0), (0, mq - m)))
    # xp[lo + j] = x[j]; the widest in-kernel window read ends at
    # al_max + WIN <= st_max + (nmt-1)*mt + 2^ceil(log2(mt+128))
    win_ub = 1
    while win_ub < min(_MT, mq) + 128:
        win_ub <<= 1
    wp = round_up(lo + int(offsets.max(initial=0)) + mq + win_ub + 128, 128)
    wp = max(wp, round_up(lo + x.shape[0] + hi + win_ub, 128))
    starts = jnp.asarray((offsets + lo).astype(np.int32))
    out = _dia_spmv_jit(data, starts, x, mq=mq, nd=nd, span_lo=lo, wp=wp)
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
