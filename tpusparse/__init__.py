"""tpusparse — a TPU-native sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
smoorjani/matrix-multiplication (a PyTorch CUDA-extension SpMM library):
sparse storage (COO/CSR/BSR), dense GEMM with transpose/batch variants,
naive and tiled (inspector-executor) SpMM, SDDMM, autograd via
``jax.custom_vjp``, FC-layer / MNIST / BERT-attention integration, and
multi-host scaling via ``jax.sharding`` + ``shard_map``.

Layer map (TPU-native analog of reference layers L1-L5):
  kernels/   Pallas TPU kernels              (ref: src/*.cu)
  plan.py    inspector plans + roofline      (ref: custom_mm.cpp plan registries)
  ops.py     custom_vjp public op surface    (ref: matmuls.py InplaceFunctions)
  nn/        neural-net modules              (ref: benchmarks/*_fc_layer.py)
  models/    MLP / BERT-attention models     (ref: benchmarks/mnist_benchmark.py)
  parallel/  mesh, shard_map SpMM, halo      (new; reference is single-GPU)
"""

from tpusparse.types import (
    COO,
    CSR,
    BSR,
    DIA,
    coo_to_csr,
    csr_to_coo,
    csr_to_dia,
    dia_to_csr,
    csr_to_bsr,
    bsr_to_csr,
    random_csr,
    random_coo,
    random_powerlaw_csr,
    spmm_reference,
    sddmm_reference,
)
from tpusparse import dense
from tpusparse.dense import matmul, bmm
from tpusparse import ops
from tpusparse.ops import (
    mm,
    transa_mm,
    transb_mm,
    transab_mm,
    spmm,
    spmm_blocks,
    footprint_spmm,
    resident_spmm,
    gather_spmm,
    dia_spmm,
    naive_spmm,
    tiled_spmm,
    sddmm,
    dsmm,
    transpose_csr,
)
from tpusparse.spgemm import spgemm, spgemm_plan, SpGEMMPlan
from tpusparse.elementwise import (
    sp_add,
    sp_sub,
    sp_hadamard,
    sp_scale,
    sp_map,
    sp_kron,
    sp_tril,
    sp_triu,
    permute_csr,
    prune_csr,
    row_reduce,
    row_softmax,
    col_reduce,
    sp_norm,
    vstack,
    hstack,
    block_diag,
)
from tpusparse.plan import (
    Plan,
    build_plan,
    save_plan,
    load_plan,
    plan_cache_info,
    clear_plan_cache,
)
from tpusparse import interop
from tpusparse import linalg
from tpusparse import amg
from tpusparse.amg import amg_preconditioner, smoothed_aggregation_setup
from tpusparse.linalg import speye
from tpusparse import patch
from tpusparse import quant
from tpusparse.quant import QuantizedMatrix, QuantizedDense, quantized_matmul
from tpusparse.utils.calibrate import calibrate
from tpusparse.patch import PatchedDense, patch_flax_dense, sparsify_dense_params

__version__ = "0.1.0"

__all__ = [
    "amg",
    "amg_preconditioner",
    "smoothed_aggregation_setup",
    "COO",
    "CSR",
    "BSR",
    "DIA",
    "csr_to_dia",
    "dia_to_csr",
    "dia_spmm",
    "coo_to_csr",
    "csr_to_coo",
    "csr_to_bsr",
    "bsr_to_csr",
    "random_csr",
    "random_coo",
    "random_powerlaw_csr",
    "spmm_reference",
    "sddmm_reference",
    "dense",
    "matmul",
    "bmm",
    "ops",
    "mm",
    "transa_mm",
    "transb_mm",
    "transab_mm",
    "spmm",
    "spmm_blocks",
    "footprint_spmm",
    "resident_spmm",
    "gather_spmm",
    "naive_spmm",
    "tiled_spmm",
    "sddmm",
    "dsmm",
    "transpose_csr",
    "spgemm",
    "spgemm_plan",
    "SpGEMMPlan",
    "sp_add",
    "sp_sub",
    "sp_hadamard",
    "sp_scale",
    "sp_map",
    "sp_kron",
    "sp_tril",
    "sp_triu",
    "permute_csr",
    "prune_csr",
    "row_reduce",
    "row_softmax",
    "col_reduce",
    "sp_norm",
    "vstack",
    "hstack",
    "block_diag",
    "interop",
    "linalg",
    "speye",
    "patch",
    "quant",
    "QuantizedMatrix",
    "QuantizedDense",
    "quantized_matmul",
    "calibrate",
    "PatchedDense",
    "patch_flax_dense",
    "sparsify_dense_params",
    "Plan",
    "build_plan",
    "save_plan",
    "load_plan",
    "plan_cache_info",
    "clear_plan_cache",
]
