"""int8 quantized SpMM — the serving path.

No reference analog (the reference is fp32-only, `#define T float`
src/sparse_mm.cu:12); this is the TPU-native capability the reference's
inspector–executor lifecycle points at for production inference: the
v5e MXU runs s8×s8→s32 at 2× the bf16 rate, so a weight-sparse layer
whose fp32 executor is MXU-pass-bound gets ~6× fewer MXU cycles
(1 int8 pass vs 3 bf16 passes), and the resident B panel shrinks 4×.

Measured on v5e (benchmarks/quant_benchmark.py --full, the 16384²
10%-of-128²-blocks headline × 512): int8 kernel-only 0.194 ms = 2.78×
over the fp32 resident executor (0.540 ms same session); end-to-end
with per-call activation quantization 0.237 ms = 2.28×; rel err
1.48e-2 vs fp64 (int8's information limit).

Scheme (standard symmetric w8a8):
- weights (the sparse A): quantized ONCE per (bm, bk) block —
  `s_a[slot] = max|block| / 127` — so the scale granularity matches the
  MXU tile exactly; packed alongside the Plan like any block values.
- activations (dense B): quantized per call, per COLUMN —
  `t[n] = max|B[:, n]| / 127` — a cheap VPU pass that keeps the output
  scale separable: C = (Σ_l s_a[l]·(Qa_l @ Qb)) ∘ t.

Accuracy is serving-grade (~1e-2 relative — int8's information limit),
NOT the fp32-parity tier of the float executors; it is an explicit
opt-in via `QuantizedMatrix`, never a router choice.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.kernels.tiled_spmm import (
    resident_int8_vmem_bytes,
    resident_spmm_int8_pallas,
    tiled_spmm_int8_pallas,
)
from tpusparse.plan import Plan, build_plan
from tpusparse.types import BSR, COO, CSR, bsr_to_csr, coo_to_csr
from tpusparse.utils.config import get_config, round_up


def quantize_block_values(block_vals: jnp.ndarray):
    """Per-block symmetric int8 quantization of packed ELL values.

    block_vals: (num_slots, bm, bk) float. Returns (qvals int8 same
    shape, scales f32 (num_slots,)). All-zero (pad) blocks get scale 0
    and contribute exactly nothing. Jittable.
    """
    absmax = jnp.max(jnp.abs(block_vals), axis=(1, 2))
    s = absmax / 127.0
    safe = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(
        jnp.round(block_vals / safe[:, None, None]), -127, 127
    ).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def quantize_columns(b: jnp.ndarray):
    """Per-column symmetric int8 quantization of a dense (k, n) operand.

    Returns (q int8 (k, n), t f32 (n,)). Jittable — this runs per
    serving call (dynamic activation quantization).
    """
    absmax = jnp.max(jnp.abs(b), axis=0)
    t = absmax / 127.0
    safe = jnp.where(t > 0, t, 1.0)
    q = jnp.clip(jnp.round(b / safe), -127, 127).astype(jnp.int8)
    return q, t.astype(jnp.float32)


class QuantizedMatrix:
    """Inspect-once, quantize-once sparse weight matrix for serving.

    The quantized analog of the Plan lifecycle (reference
    custom_mm.cpp:283-357 inspect/multiply, rebuilt TPU-native): build
    from a float CSR/BSR/COO once, then `qa @ b` (or `qa.matmul(b)`)
    quantizes the activations per column and runs the single-pass int8
    resident executor.

        qa = QuantizedMatrix(a_csr)
        y = qa @ x          # x float (k, n) -> f32 (m, n)

    `dequantize()` returns the effective float CSR (what the int8
    representation actually encodes) for error auditing.
    """

    def __init__(
        self,
        a: Union[CSR, BSR, COO],
        blocksize: Optional[tuple] = None,
    ):
        if isinstance(a, BSR):
            a = bsr_to_csr(a)
        elif isinstance(a, COO):
            a = coo_to_csr(a)
        if not isinstance(a, CSR):
            raise TypeError(f"QuantizedMatrix needs CSR/BSR/COO, got {type(a)}")
        self.plan: Plan = build_plan(a, blocksize)
        self.shape = a.shape
        self._pattern = (a.indptr, a.indices)
        block_vals = self.plan.pack_values(a.data.astype(jnp.float32))
        self.qvals, self.scales = quantize_block_values(block_vals)

    def matmul(self, b: jnp.ndarray, *, block_n: Optional[int] = None):
        """C ≈ A @ B. b: float (k,) or (k, n). Returns f32, same rank."""
        vec = b.ndim == 1
        if vec:
            b = b[:, None]
        if b.ndim != 2 or b.shape[0] != self.shape[1]:
            raise ValueError(
                f"b shape {b.shape} incompatible with A {self.shape}"
            )
        q, t = quantize_columns(b)
        # executor dispatch mirrors the float path's _block_exec: resident
        # int8 panel when it fits VMEM AND the pattern re-uses it, the int8
        # ELL DMA-ring otherwise — so serving works at ANY k (no shape
        # cliff; the two kernels are bitwise identical on shared shapes)
        cfg = get_config()
        bn = min(block_n or cfg.spmm_block_n, round_up(b.shape[1], 128))
        if (
            self.plan.nblocks >= self.plan.num_col_blocks
            and resident_int8_vmem_bytes(self.plan, bn)
            <= cfg.vmem_limit_bytes
        ):
            out = resident_spmm_int8_pallas(
                self.plan, self.qvals, self.scales, q, t, block_n=block_n
            )
        else:
            out = tiled_spmm_int8_pallas(
                self.plan, self.qvals, self.scales, q, t, block_n=block_n
            )
        return out[:, 0] if vec else out

    __matmul__ = matmul

    def dequantize(self) -> CSR:
        """The float CSR this int8 representation encodes (audit tool)."""
        block_vals = self.qvals.astype(jnp.float32) * self.scales[:, None, None]
        data = self.plan.unpack_values(block_vals)
        indptr, indices = self._pattern
        return CSR(data=data, indices=indices, indptr=indptr, shape=self.shape)

    def quantization_error(self, a: Union[CSR, BSR, COO]) -> float:
        """Max relative error of the stored weights vs the original."""
        if isinstance(a, BSR):
            a = bsr_to_csr(a)
        elif isinstance(a, COO):
            a = coo_to_csr(a)
        dq = np.asarray(self.dequantize().data, np.float64)
        orig = np.asarray(a.data, np.float64)
        denom = np.abs(orig).max()
        return float(np.abs(dq - orig).max() / (denom if denom else 1.0))

    def vmem_bytes(self, n: int, block_n: Optional[int] = None) -> int:
        """VMEM footprint the executor will need at width n."""
        cfg = get_config()
        bn = min(block_n or cfg.spmm_block_n, round_up(n, 128))
        return resident_int8_vmem_bytes(self.plan, bn)

    def __repr__(self):
        return (
            f"QuantizedMatrix(shape={self.shape}, "
            f"nblocks={self.plan.nblocks}, blocksize={self.plan.blocksize}, "
            f"int8 + per-block scales)"
        )


def quantize_rows(a: jnp.ndarray):
    """Per-row symmetric int8 quantization: (q (m, k) int8, s (m,) f32)
    with a ≈ s[:, None] * q. Row grain matches the GEMM contraction — the
    dequantized product is a rank-1 rescale of the int32 result."""
    if a.ndim != 2:
        raise ValueError(f"quantize_rows takes a 2-D array, got {a.shape}")
    amax = jnp.max(jnp.abs(a), axis=1)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(a / s[:, None]), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def quantized_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dense int8 serving matmul: per-row-quantize A, per-column-quantize
    B, one s8xs8->s32 Pallas GEMM pass (2x the bf16 MXU rate on v5e),
    rank-1 dequantize. ~1e-2 relative error (the int8 information
    limit) — an explicit serving-tier opt-in, like `QuantizedMatrix`
    for the sparse side. No reference analog (its cuBLAS path is fp32
    only, baseline_mm.cu:59); completes the framework's precision
    ladder (fp32-3pass / bf16 / int8) across dense and sparse."""
    from tpusparse.kernels.gemm import gemm_int8_pallas

    qa, sa = quantize_rows(a)
    qb, sb = quantize_columns(b)
    acc = gemm_int8_pallas(qa, qb)
    return acc.astype(jnp.float32) * sa[:, None] * sb[None, :]


class QuantizedDense:
    """A dense weight held in int8 for inspect-once/serve-many matmuls.

    The dense analog of `QuantizedMatrix`: the weight is quantized ONCE
    (per-row scales); each `matmul(x)` quantizes only the activation
    panel (per-column scales) and runs the int8 Pallas GEMM.
    """

    def __init__(self, w: jnp.ndarray):
        if w.ndim != 2:
            raise ValueError(f"QuantizedDense takes a 2-D weight, got {w.shape}")
        self.qw, self.sw = quantize_rows(jnp.asarray(w))
        self.shape = tuple(w.shape)

    def matmul(self, x: jnp.ndarray) -> jnp.ndarray:
        from tpusparse.kernels.gemm import gemm_int8_pallas

        vec = x.ndim == 1
        if vec:
            x = x[:, None]
        if x.ndim != 2 or x.shape[0] != self.shape[1]:
            raise ValueError(
                f"x shape {x.shape} incompatible with weight {self.shape}"
            )
        qx, sx = quantize_columns(x)
        acc = gemm_int8_pallas(self.qw, qx)
        out = acc.astype(jnp.float32) * self.sw[:, None] * sx[None, :]
        return out[:, 0] if vec else out

    __matmul__ = matmul

    def dequantize(self) -> jnp.ndarray:
        return self.qw.astype(jnp.float32) * self.sw[:, None]

    def __repr__(self):
        return f"QuantizedDense(shape={self.shape}, int8 + f32 row scales)"
