from tpusparse.models.mlp import MnistNet, train_step, make_train_state
from tpusparse.models.bert import BertAttentionLayer, BertEncoder

__all__ = ["MnistNet", "train_step", "make_train_state", "BertAttentionLayer", "BertEncoder"]
