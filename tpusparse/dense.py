"""Dense matmul surface: trans/batch variants with shape-based routing.

TPU-native replacement for the reference's dense dispatcher
(`custom_matmul`, matmuls.py:13-72) and the cuBLAS wrappers it drives
(src/baseline_mm.cu:52-155). Differences by design:

  * Transposes are expressed through ``lax.dot_general`` dimension numbers —
    no operand copies and no row/col-major swap (reference
    baseline_mm.cu:61-92 does the Cᵀ=BᵀAᵀ trick; XLA handles layout).
  * Arbitrary leading batch dims are handled natively by one traced einsum —
    the reference reshapes 3-D to 2-D (matmuls.py:43-52) and falls back to a
    Python loop + stack for ≥5-D (matmuls.py:61-63).
  * 2-D core can route through the Pallas GEMM kernel
    (tpusparse/kernels/gemm.py) when enabled in config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpusparse.kernels.gemm import gemm_pallas
from tpusparse.utils.config import get_config

def _precision():
    from tpusparse.utils.config import matmul_precision

    return matmul_precision()  # single name->lax.Precision mapping


def split_bf16_rtn(x: jnp.ndarray):
    """(hi, lo) bf16 split of fp32 x, safe under jit on TPU.

    The naive split `lo = x - x.astype(bf16).astype(f32)` is FOLDED AWAY
    by XLA's algebraic simplifier inside jit on TPU (lo collapses to ~0,
    silently degrading the 3-pass mode from ~7e-7 to ~3e-4 rel err —
    eager calls are unaffected, which is how it hid). Computing hi by
    integer rounding+masking of the raw bits gives XLA nothing to fold:
    add 0x8000 (round half away) then clear the low 16 bits — exactly
    bf16 round-to-nearest up to ties. Measured 9e-7 rel err at k=512
    inside jit on v5e. (Pallas kernels keep the arithmetic split —
    Mosaic does not perform this folding; see kernels/mxu.py.)
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        (u + np.uint32(0x8000)) & np.uint32(0xFFFF0000), jnp.float32
    )
    return hi_f32.astype(jnp.bfloat16), (x - hi_f32).astype(jnp.bfloat16)


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """jnp.matmul honoring the configured precision.

    'high' uses a manual 3-pass bf16 decomposition (hi/lo split with
    round-to-nearest) rather than lax.Precision.HIGH: measured ~1.3e-6
    max rel err vs HIGH's ~1e-5 at the same 3-matmul cost, which keeps
    fp32 results inside the reference's torch.allclose rtol=1e-5.
    """
    if (
        get_config().precision in ("high", "bf16x3")
        and a.dtype == jnp.float32
        and b.dtype == jnp.float32
        and jax.default_backend() == "tpu"  # CPU matmul is native fp32
    ):
        a_hi, a_lo = split_bf16_rtn(a)
        b_hi, b_lo = split_bf16_rtn(b)
        kw = dict(preferred_element_type=jnp.float32)
        return (
            jnp.matmul(a_hi, b_hi, **kw)
            + jnp.matmul(a_hi, b_lo, **kw)
            + jnp.matmul(a_lo, b_hi, **kw)
        )
    return jnp.matmul(a, b, precision=_precision())


def einsum(spec: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two-operand einsum honoring the configured precision ('high' uses
    the same manual 3-pass bf16 decomposition as _mm)."""
    if (
        get_config().precision in ("high", "bf16x3")
        and a.dtype == jnp.float32
        and b.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    ):
        a_hi, a_lo = split_bf16_rtn(a)
        b_hi, b_lo = split_bf16_rtn(b)
        kw = dict(preferred_element_type=jnp.float32)
        return (
            jnp.einsum(spec, a_hi, b_hi, **kw)
            + jnp.einsum(spec, a_hi, b_lo, **kw)
            + jnp.einsum(spec, a_lo, b_hi, **kw)
        )
    return jnp.einsum(
        spec, a, b, precision=_precision(), preferred_element_type=jnp.float32
    )


def matmul(
    a: jnp.ndarray,
    b: jnp.ndarray,
    transa: bool = False,
    transb: bool = False,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """General (batched) matmul with transpose flags on the last two dims.

    Covers the reference surface: cublas_mmul / cublas_bmm for dims 2/3/4
    (custom_mm.cpp:104-164) plus the ≥5-D loop path (matmuls.py:61-63),
    and the 1-D matrix-vector fallback (matmuls.py:39-41).
    """
    # transpose flags first: the 1-D fallback below must not silently
    # ignore a requested transpose of the 2-D operand (flags on a 1-D
    # operand itself are meaningless and rejected)
    if transa:
        if a.ndim < 2:
            raise ValueError("transa requires a ≥2-D left operand")
        a = jnp.swapaxes(a, -1, -2)
    if transb:
        if b.ndim < 2:
            raise ValueError("transb requires a ≥2-D right operand")
        b = jnp.swapaxes(b, -1, -2)

    if a.ndim == 1 or b.ndim == 1:
        # Reference falls back to torch matmul for vectors (matmuls.py:39-41).
        return _mm(a, b)

    if a.ndim == 2 and b.ndim == 2:
        cfg = get_config()
        if use_pallas or (use_pallas is None and cfg.use_pallas_gemm):
            return gemm_pallas(a, b)
        return _mm(a, b)

    # Mixed-rank: broadcast like jnp.matmul. The reference flattens 3-D×2-D
    # to one big 2-D GEMM (matmuls.py:43-47) — XLA does the same fusion from
    # this expression without explicit reshapes.
    return _mm(a, b)


def bmm(
    a: jnp.ndarray,
    b: jnp.ndarray,
    transa: bool = False,
    transb: bool = False,
) -> jnp.ndarray:
    """Strictly batched matmul (both operands ≥3-D, equal batch shape).

    Analog of `cublas_bmm_wrapper` (baseline_mm.cu:105-155). Any number of
    leading batch dims is supported (reference folds 4-D batch dims,
    custom_mm.cpp:146-156, and loops for ≥5-D, matmuls.py:61-63).
    """
    if a.ndim < 3 or b.ndim < 3:
        raise ValueError(f"bmm expects ≥3-D operands, got {a.shape}, {b.shape}")
    if a.shape[:-2] != b.shape[:-2]:
        raise ValueError(
            f"bmm batch dims must match: {a.shape[:-2]} vs {b.shape[:-2]}"
        )
    return matmul(a, b, transa=transa, transb=transb)
