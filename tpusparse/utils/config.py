"""Framework configuration.

TPU-native analog of the reference's compile-time ``#define`` knobs
(src/sparse_mm.cu:6-16: NUMBLOCKS/BLOCKSIZE/REGISTER/BUFFSIZE/WARPSIZE) —
a small dataclass resolved at trace time. Pallas block shapes are the
analog of BLOCKSIZE/BUFFSIZE; the VMEM budget is the analog of the 96KB
shared-memory buffer.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@dataclasses.dataclass
class Config:
    # Dense Pallas GEMM tile sizes (MXU-aligned).
    # Autotuned on TPU v5e (4096² bf16, median-of-7): (2048, 1024, 512)
    # beat (512, 512, 512) by ~25% once the scoped-VMEM cap was lifted.
    gemm_block_m: int = 2048
    gemm_block_n: int = 1024
    gemm_block_k: int = 512
    # Whether dense ops route 2-D matmuls through the Pallas GEMM kernel
    # (otherwise lax.dot_general; XLA's GEMM is the fallback either way).
    use_pallas_gemm: bool = False
    # Tiled SpMM block sizes (BSR block = (block_m, block_k); N tile = block_n).
    spmm_block_m: int = 128
    spmm_block_k: int = 128
    spmm_block_n: int = 512
    # VMEM budget per kernel instance (bytes); analog of the reference's
    # 96KB shared-memory BUFFSIZE but sized for TPU VMEM (~16MB less headroom).
    vmem_limit_bytes: int = 64 * 1024 * 1024
    # Debug mode: ops validate sparse operand structure per call (host
    # side) — the analog of the reference's always-on status-code guards
    # (Utilities.cuh); off by default for zero dispatch overhead.
    debug_checks: bool = False
    # Force Pallas interpreter mode (None = auto: interpret on CPU backend).
    interpret: Optional[bool] = None
    # Default matmul precision for fp32 parity with the reference's
    # torch.allclose tolerances (fp32 cuBLAS): "high" = 3-pass bf16 MXU
    # (~7e-7 max rel err, passes allclose rtol=1e-5), "highest" = 6-pass,
    # "default" = single-pass bf16 (fast path for perf runs).
    precision: str = "high"


_config = Config()


def get_config() -> Config:
    return _config


def set_config(**kwargs) -> Config:
    for k, v in kwargs.items():
        if not hasattr(_config, k):
            raise AttributeError(f"unknown config field {k!r}")
        setattr(_config, k, v)
    return _config


def matmul_precision(override: Optional[str] = None):
    """Resolve the configured fp32 matmul precision to a lax.Precision
    (for XLA paths — dot_general/einsum).

    'highest' = 6-pass bf16 (bitwise closest to fp32), 'high' = 3-pass
    (fp32-class fidelity, ~1.5x faster), 'default' = single-pass bf16.
    """
    name = override or _config.precision
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        # 'bf16x3' is primarily a Pallas-kernel name (explicit 3-pass
        # split); on XLA paths treat it as the same fidelity class so a
        # global set_config(precision='bf16x3') cannot crash dense ops
        "bf16x3": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[name]


def pallas_precision(override: Optional[str] = None):
    """Resolve precision for Pallas kernels (Mosaic lowers DEFAULT and
    HIGHEST only; 'high' maps to the manual 3-pass decomposition in
    kernels/mxu.py, measured at ~7e-7 max rel err and ~1.5x the speed of
    HIGHEST on the tiled executor). On non-TPU backends (interpret mode)
    dots are native fp32, so 'high' maps to HIGHEST — the bf16 split
    would only add error there."""
    name = override or _config.precision
    if name == "high" and jax.default_backend() != "tpu":
        name = "highest"
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": "bf16x3",
        # explicit 3-pass name, backend-independent: unlike 'high' it does
        # NOT fall back to HIGHEST off-TPU, so CPU interpret-mode tests can
        # cover the manual bf16-split kernel branch.
        "bf16x3": "bf16x3",
        "default": jax.lax.Precision.DEFAULT,
    }[name]


def eager_precision(jitted_fn):
    """Resolve the config's precision default OUTSIDE a jitted kernel entry.

    The kernel entries are `jax.jit`-ed with `precision` as a static arg
    defaulting to None, and resolve the config inside the traced body. A
    bare None in the cache key freezes whatever mode the FIRST trace
    resolved: after `set_config(precision='default')`, a later call with
    the same shapes silently reuses the stale 3-pass (or vice-versa)
    kernel — measured on TPU, the mode switch was a no-op. Wrapping the
    entry so None becomes the concrete config name before the jit boundary
    makes the mode part of the cache key.
    """

    @functools.wraps(jitted_fn)
    def wrapper(*args, precision: Optional[str] = None, **kwargs):
        return jitted_fn(
            *args, precision=precision or _config.precision, **kwargs
        )

    return wrapper


@functools.cache
def _default_backend() -> str:
    return jax.default_backend()


def interpret_mode() -> bool:
    """Pallas kernels run interpreted on non-TPU backends so the whole test
    suite runs without a TPU (SURVEY.md §4 test-plan requirement)."""
    if _config.interpret is not None:
        return _config.interpret
    return _default_backend() != "tpu"
