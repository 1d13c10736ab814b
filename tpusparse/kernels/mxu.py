"""MXU dot helper shared by the Pallas kernels.

fp32 operands on the TPU MXU run as bf16 passes. XLA exposes
DEFAULT (1 pass), HIGH (3 passes) and HIGHEST (6 passes), but Mosaic
(Pallas) only lowers DEFAULT and HIGHEST — so the 3-pass mode, which
already reaches fp32-class fidelity (~7e-7 max rel err at k=16384,
measured) at ~1.5x the speed of HIGHEST, is implemented here manually:
split each operand into a bf16 hi part and a bf16 lo remainder and
accumulate a_hi·b_hi + a_hi·b_lo + a_lo·b_hi in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_bf16(x: jnp.ndarray):
    # The arithmetic split is safe HERE because Mosaic does not run XLA's
    # algebraic simplifier; in XLA-compiled (non-Pallas) code this exact
    # pattern is folded away under jit on TPU (lo -> ~0) — those paths
    # must use dense.split_bf16_rtn (bit-masked) instead.
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot(a: jnp.ndarray, b: jnp.ndarray, precision) -> jnp.ndarray:
    """a @ b with fp32 accumulation, honoring the framework precision.

    `precision` is a resolved value from config.pallas_precision:
    'bf16x3' (manual 3-pass), or a lax.Precision for DEFAULT/HIGHEST.
    """
    # The bf16 passes must pin precision=DEFAULT explicitly: an ambient
    # jax.default_matmul_precision("highest") context (the Krylov solvers
    # set one around their whole scan) otherwise leaks in, and Mosaic
    # cannot lower fp32 contract precision on bf16 operands ("Bad lhs
    # type"). bf16×bf16 is exact in one MXU pass, so DEFAULT loses nothing.
    if precision == "bf16x3":
        if a.dtype != jnp.float32 or b.dtype != jnp.float32:
            return jnp.dot(
                a,
                b,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        kw = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = jnp.dot(a_hi, b_hi, **kw)
        acc += jnp.dot(a_hi, b_lo, **kw)
        acc += jnp.dot(a_lo, b_hi, **kw)
        return acc
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=precision
    )


_NT_DIMS = (((1,), (1,)), ((), ()))
_TN_DIMS = (((0,), (0,)), ((), ()))


def dot_tn(a: jnp.ndarray, b: jnp.ndarray, precision) -> jnp.ndarray:
    """aᵀ @ b (contraction on the FIRST axis of both) with fp32 accumulation."""
    if precision == "bf16x3":
        kw = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,  # see dot(): Mosaic can't
        )  # lower an ambient 'highest' context onto bf16 operands
        if a.dtype != jnp.float32 or b.dtype != jnp.float32:
            return jax.lax.dot_general(a, b, _TN_DIMS, **kw)
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        acc = jax.lax.dot_general(a_hi, b_hi, _TN_DIMS, **kw)
        acc += jax.lax.dot_general(a_hi, b_lo, _TN_DIMS, **kw)
        acc += jax.lax.dot_general(a_lo, b_hi, _TN_DIMS, **kw)
        return acc
    return jax.lax.dot_general(
        a, b, _TN_DIMS, preferred_element_type=jnp.float32, precision=precision
    )


def dot_nt(a: jnp.ndarray, b: jnp.ndarray, precision) -> jnp.ndarray:
    """a @ bᵀ (contraction on the last axis of both) with fp32 accumulation."""
    if precision == "bf16x3":
        kw = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,  # see dot(): Mosaic can't
        )  # lower an ambient 'highest' context onto bf16 operands
        if a.dtype != jnp.float32 or b.dtype != jnp.float32:
            return jax.lax.dot_general(a, b, _NT_DIMS, **kw)
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        acc = jax.lax.dot_general(a_hi, b_hi, _NT_DIMS, **kw)
        acc += jax.lax.dot_general(a_hi, b_lo, _NT_DIMS, **kw)
        acc += jax.lax.dot_general(a_lo, b_hi, _NT_DIMS, **kw)
        return acc
    return jax.lax.dot_general(
        a, b, _NT_DIMS, preferred_element_type=jnp.float32, precision=precision
    )
