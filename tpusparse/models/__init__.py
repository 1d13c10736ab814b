from tpusparse.models.mlp import MnistNet, train_step, make_train_state
from tpusparse.models.bert import BertAttentionLayer, BertEncoder
from tpusparse.models.gcn import (
    GCN,
    GCNLayer,
    normalized_adjacency,
    random_graph,
    two_cluster_graph,
)
from tpusparse.models.gat import GAT, GATLayer, add_self_loops
from tpusparse.models.appnp import APPNP, appnp_propagate
from tpusparse.models.gpt import GPTBlock, GPTDecoder, generate
from tpusparse.models.serving import QuantizedGPT, quantize_gpt

__all__ = [
    "MnistNet",
    "train_step",
    "make_train_state",
    "BertAttentionLayer",
    "BertEncoder",
    "GCN",
    "GCNLayer",
    "normalized_adjacency",
    "random_graph",
    "two_cluster_graph",
    "GAT",
    "APPNP",
    "appnp_propagate",
    "GATLayer",
    "add_self_loops",
    "GPTBlock",
    "GPTDecoder",
    "generate",
    "QuantizedGPT",
    "quantize_gpt",
]
