from tpusparse.nn.layers import DenseLinear, SparseLinear, BlockSparseLinear, Pattern
from tpusparse.nn.attention import (
    SelfAttention,
    SparseSelfAttention,
    BigBirdAttention,
    bigbird_pattern,
    bigbird_block_mask,
    LocalAttention,
    local_global_pattern,
    route_sparse_attention,
)

__all__ = [
    "DenseLinear",
    "SparseLinear",
    "BlockSparseLinear",
    "Pattern",
    "SelfAttention",
    "SparseSelfAttention",
    "BigBirdAttention",
    "bigbird_pattern",
    "bigbird_block_mask",
    "LocalAttention",
    "local_global_pattern",
    "route_sparse_attention",
]

from tpusparse.nn.rigl import (
    apply_masks,
    cosine_drop_fraction,
    harvest_csr,
    init_masks,
    mask_grads,
    random_mask,
    rigl_update,
    rigl_update_tree,
    sparsity_of,
)

__all__ += [
    "apply_masks",
    "cosine_drop_fraction",
    "harvest_csr",
    "init_masks",
    "mask_grads",
    "random_mask",
    "rigl_update",
    "rigl_update_tree",
    "sparsity_of",
]
