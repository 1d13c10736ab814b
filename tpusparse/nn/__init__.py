from tpusparse.nn.layers import DenseLinear, SparseLinear, Pattern
from tpusparse.nn.attention import SelfAttention

__all__ = ["DenseLinear", "SparseLinear", "Pattern", "SelfAttention"]
