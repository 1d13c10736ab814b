from tpusparse.nn.layers import DenseLinear, SparseLinear, Pattern
from tpusparse.nn.attention import (
    SelfAttention,
    SparseSelfAttention,
    LocalAttention,
    local_global_pattern,
)

__all__ = [
    "DenseLinear",
    "SparseLinear",
    "Pattern",
    "SelfAttention",
    "SparseSelfAttention",
    "LocalAttention",
    "local_global_pattern",
]
