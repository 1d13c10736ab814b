"""Neural-net layers backed by this framework's matmul ops.

TPU-native analog of the reference FC modules `cublasLinear` /
`cusparseLinear` (benchmarks/cublas_fc_layer.py:12-52,
benchmarks/cusparse_fc_layer.py:12-52): drop-in linear layers whose
forward is ``op(x, Wᵀ) + b``, with the reference's init scheme
(kaiming-uniform weights with a=√5 ⇒ U(±1/√fan_in), fan-in bias bound,
cublas_fc_layer.py:29-34).

Key redesign: the reference's sparse layer re-converts its dense weight to
CSR on every forward (matmuls.py:214,227 — pattern rebuilt per call). Here
`SparseLinear` owns a *static* sparsity pattern (a trace-time constant);
only the nnz value vector is a parameter, so the inspector plan is built
once and every training step reuses it.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpusparse import ops
from tpusparse.plan import build_plan_pair
from tpusparse.types import CSR


@dataclass(frozen=True, eq=False)
class Pattern:
    """Hashable host-side sparsity pattern (static module field).

    Hashability makes it usable as a flax static attribute and as a jit
    static argument. Backed by READ-ONLY numpy int32 arrays with a
    fingerprint computed once at construction: storing tuples of Python
    ints held tens of millions of boxed objects at BERT scale (~5M nnz),
    and every hash/to_csr rebuilt the arrays from scratch. Equality and
    hash are by content fingerprint.
    """

    indices: np.ndarray
    indptr: np.ndarray
    shape: Tuple[int, int]

    def __post_init__(self):
        idx = np.ascontiguousarray(np.asarray(self.indices, dtype=np.int32))
        ptr = np.ascontiguousarray(np.asarray(self.indptr, dtype=np.int32))
        # copy before freezing when the conversion returned the caller's own
        # buffer (already-contiguous int32 input) — flipping writeable on a
        # shared array would break later in-place writes caller-side
        if idx is self.indices:
            idx = idx.copy()
        if ptr is self.indptr:
            ptr = ptr.copy()
        idx.flags.writeable = False  # frozen content backs the cached hash
        ptr.flags.writeable = False
        object.__setattr__(self, "indices", idx)
        object.__setattr__(self, "indptr", ptr)
        h = hashlib.sha1()
        h.update(idx.tobytes())
        h.update(ptr.tobytes())
        h.update(repr(tuple(self.shape)).encode())
        object.__setattr__(self, "_fp", h.digest())

    @classmethod
    def from_csr(cls, a: CSR) -> "Pattern":
        return cls(
            indices=np.asarray(a.indices),
            indptr=np.asarray(a.indptr),
            shape=a.shape,
        )

    @classmethod
    def random(cls, seed: int, shape: Tuple[int, int], density: float) -> "Pattern":
        """Pure-numpy pattern sampling (safe to call at trace time)."""
        m, n = shape
        nnz = max(1, int(round(density * m * n)))
        rng = np.random.default_rng(seed)
        flat = rng.choice(m * n, size=nnz, replace=False)
        flat.sort()
        rows = (flat // n).astype(np.int32)
        cols = (flat % n).astype(np.int32)
        indptr = np.zeros(m + 1, dtype=np.int64)
        np.add.at(indptr[1:], rows, 1)
        indptr = np.cumsum(indptr)
        return cls(indices=cols, indptr=indptr, shape=(m, n))

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    def to_csr(self, data: jnp.ndarray) -> CSR:
        # numpy (not jnp) index arrays: under jit tracing, jnp.asarray of a
        # Python sequence becomes a tracer, which would defeat the host-side
        # plan inspector; numpy constants stay concrete at trace time.
        return CSR(
            data=data,
            indices=self.indices,
            indptr=self.indptr,
            shape=self.shape,
        )

    def __eq__(self, other):
        return (
            isinstance(other, Pattern)
            and self.shape == other.shape
            and self._fp == other._fp
        )

    def __hash__(self):
        return int.from_bytes(self._fp[:8], "little")


def _ref_weight_init(key, shape, dtype=jnp.float32):
    """U(±1/√fan_in): torch kaiming_uniform_(a=√5) on an (out, in) weight."""
    fan_in = shape[-1]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _ref_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class DenseLinear(nn.Module):
    """nn.Linear-compatible dense layer on the framework's mm op."""

    features: int
    use_bias: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", _ref_weight_init, (self.features, in_features)
        )
        lead = x.shape[:-1]
        x2 = x.reshape(-1, in_features)
        # x @ Wᵀ via the transb op (the reference calls cublasMM with W.t(),
        # cublas_fc_layer.py:41; expressing the transpose through the op
        # avoids materializing Wᵀ).
        if self.use_pallas:
            from tpusparse import dense

            y = dense.matmul(x2, kernel, transb=True, use_pallas=True)
        else:
            y = ops.transb_mm(x2, kernel)
        y = y.reshape(*lead, self.features)
        if self.use_bias:
            bias = self.param("bias", _ref_bias_init(in_features), (self.features,))
            y = y + bias
        return y


class BlockSparseLinear(nn.Module):
    """Linear layer whose weight lives directly in packed ELL block form.

    `SparseLinear` stores the nnz value vector and re-packs it into the
    executor's block layout every forward (~5 ns/nnz XLA scatter). Here
    the *parameter is the packed block tensor* (num_slots, bm, bk) with a
    static 0/1 mask keeping optimizer updates inside the sparsity
    pattern — zero packing cost per step, the single-device form of the
    distributed training layer (parallel/train.py). Best for training
    loops and serving; use SparseLinear when you need the nnz vector as
    the canonical parameter.
    """

    pattern: Pattern  # static (out, in) sparsity pattern
    use_bias: bool = True
    blocksize: Optional[Tuple[int, int]] = None

    @classmethod
    def random(
        cls, seed: int, in_features: int, out_features: int, density: float, **kw
    ) -> "BlockSparseLinear":
        return cls(
            pattern=Pattern.random(seed, (out_features, in_features), density), **kw
        )

    @nn.compact
    def __call__(self, x):
        from tpusparse.plan import build_plan

        out_features, in_features = self.pattern.shape
        if x.shape[-1] != in_features:
            raise ValueError(
                f"input features {x.shape[-1]} != pattern in_features {in_features}"
            )
        w_csr = self.pattern.to_csr(np.zeros((self.pattern.nnz,), np.float32))
        plan = build_plan(w_csr, self.blocksize)
        bm, bk = plan.blocksize
        bound = 1.0 / np.sqrt(in_features)

        mask = np.zeros((plan.num_slots * bm * bk,), np.float32)
        mask[np.asarray(plan.scatter_idx)] = 1.0
        mask = mask.reshape(plan.num_slots, bm, bk)

        def init_blocks(key, shape):
            vals = jax.random.uniform(
                key, (self.pattern.nnz,), minval=-bound, maxval=bound
            )
            return plan.pack_values(vals)

        blocks = self.param("kernel_blocks", init_blocks, None)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, in_features)
        y = ops.spmm_blocks(plan, blocks * mask, jnp.swapaxes(x2, 0, 1))
        y = jnp.swapaxes(y, 0, 1).reshape(*lead, out_features)
        if self.use_bias:
            bias = self.param("bias", _ref_bias_init(in_features), (out_features,))
            y = y + bias
        return y


class SparseLinear(nn.Module):
    """Linear layer with a static-sparse (out, in) weight.

    forward: y = x @ Wᵀ + b computed as (W @ xᵀ)ᵀ through the tiled
    inspector-executor SpMM; the dA/dB backward runs through the SDDMM and
    transpose-plan kernels (see tpusparse/ops.py).
    """

    pattern: Pattern  # static (out, in) sparsity pattern
    use_bias: bool = True
    method: str = "tiled"
    blocksize: Optional[Tuple[int, int]] = None

    @classmethod
    def random(
        cls, seed: int, in_features: int, out_features: int, density: float, **kw
    ) -> "SparseLinear":
        return cls(
            pattern=Pattern.random(seed, (out_features, in_features), density), **kw
        )

    @nn.compact
    def __call__(self, x):
        out_features, in_features = self.pattern.shape
        if x.shape[-1] != in_features:
            raise ValueError(
                f"input features {x.shape[-1]} != pattern in_features {in_features}"
            )
        bound = 1.0 / np.sqrt(in_features)
        values = self.param(
            "kernel_values",
            lambda k, s: jax.random.uniform(k, s, minval=-bound, maxval=bound),
            (self.pattern.nnz,),
        )
        w = self.pattern.to_csr(values)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, in_features)
        if self.method == "tiled":
            plans = build_plan_pair(w, self.blocksize)
            y = ops.tiled_spmm(w, jnp.swapaxes(x2, 0, 1), plans=plans)
        else:
            y = ops.spmm(w, jnp.swapaxes(x2, 0, 1), method=self.method)
        y = jnp.swapaxes(y, 0, 1).reshape(*lead, out_features)
        if self.use_bias:
            bias = self.param("bias", _ref_bias_init(in_features), (out_features,))
            y = y + bias
        return y
