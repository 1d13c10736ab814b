from tpusparse.nn.layers import DenseLinear, SparseLinear, BlockSparseLinear, Pattern
from tpusparse.nn.attention import (
    SelfAttention,
    SparseSelfAttention,
    LocalAttention,
    local_global_pattern,
)

__all__ = [
    "DenseLinear",
    "SparseLinear",
    "BlockSparseLinear",
    "Pattern",
    "SelfAttention",
    "SparseSelfAttention",
    "LocalAttention",
    "local_global_pattern",
]
