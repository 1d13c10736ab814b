from tpusparse.parallel.mesh import make_mesh, initialize_distributed
from tpusparse.parallel.spmm import (
    RowShardedPlan,
    shard_plan_rows,
    sharded_spmm,
    HaloShardedPlan,
    shard_plan_2d,
    halo_spmm,
)
from tpusparse.parallel.train import make_sharded_train_state, make_sharded_train_step
from tpusparse.parallel.projection import (
    ScalingProjection,
    project_sharded_spmm,
    project_halo_spmm,
    projection_table,
    count_ppermute_bytes,
)

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "RowShardedPlan",
    "shard_plan_rows",
    "sharded_spmm",
    "HaloShardedPlan",
    "shard_plan_2d",
    "halo_spmm",
    "make_sharded_train_state",
    "make_sharded_train_step",
    "ScalingProjection",
    "project_sharded_spmm",
    "project_halo_spmm",
    "projection_table",
    "count_ppermute_bytes",
]
from tpusparse.parallel.bert import (
    bert_param_specs,
    shard_bert_params,
    make_tp_forward,
    validate_tp_heads,
)

__all__ += [
    "bert_param_specs",
    "shard_bert_params",
    "make_tp_forward",
    "validate_tp_heads",
]
from tpusparse.parallel.attention import (
    ring_flash_attention,
    ring_local_attention,
    ulysses_attention,
)

__all__ += ["ring_flash_attention", "ring_local_attention", "ulysses_attention"]
from tpusparse.parallel.pipeline import pipeline_apply

__all__ += ["pipeline_apply"]
from tpusparse.parallel.moe import (
    init_moe_params,
    moe_forward,
    moe_forward_a2a,
    moe_forward_reference,
    load_balance_loss,
)

__all__ += [
    "init_moe_params",
    "moe_forward",
    "moe_forward_a2a",
    "moe_forward_reference",
    "load_balance_loss",
]
from tpusparse.parallel.gcn import (
    make_sharded_gcn_forward,
    make_sharded_gcn_train_step,
)

__all__ += ["make_sharded_gcn_forward", "make_sharded_gcn_train_step"]
from tpusparse.parallel.linalg import (
    make_sharded_matvec,
    sharded_cg,
    sharded_power_iteration,
)

__all__ += ["make_sharded_matvec", "sharded_cg", "sharded_power_iteration"]
from tpusparse.parallel.dia import make_sharded_dia_matvec, sharded_dia_cg

__all__ += ["make_sharded_dia_matvec", "sharded_dia_cg"]
from tpusparse.parallel.serving import (
    make_tp_decode_step,
    qgpt_param_specs,
    shard_qgpt,
)

__all__ += ["qgpt_param_specs", "shard_qgpt", "make_tp_decode_step"]
