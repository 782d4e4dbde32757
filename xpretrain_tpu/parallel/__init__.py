from xpretrain_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    replicated_sharding,
)
from xpretrain_tpu.parallel.pipeline import (
    PIPE_AXIS,
    make_pipeline,
    pipeline_param_shardings,
    pipelined_bert_encoder,
    stack_layer_params,
    unstack_layer_params,
)
from xpretrain_tpu.parallel.fsdp import (
    fsdp_param_shardings,
    fsdp_pspec,
    fsdp_state_shardings,
    resolve_shardings,
)
from xpretrain_tpu.parallel.moe import (
    EXPERT_AXIS,
    MoeFfn,
    moe_param_shardings,
    moe_pspec,
)
from xpretrain_tpu.parallel.tensor_parallel import (
    hybrid_state_shardings,
    tp_param_shardings,
    tp_pspec,
)

__all__ = [
    "DATA_AXIS",
    "EXPERT_AXIS",
    "MODEL_AXIS",
    "MoeFfn",
    "PIPE_AXIS",
    "moe_param_shardings",
    "moe_pspec",
    "batch_sharding",
    "create_mesh",
    "replicated_sharding",
    "fsdp_param_shardings",
    "fsdp_pspec",
    "fsdp_state_shardings",
    "resolve_shardings",
    "hybrid_state_shardings",
    "make_pipeline",
    "pipeline_param_shardings",
    "pipelined_bert_encoder",
    "stack_layer_params",
    "tp_param_shardings",
    "tp_pspec",
    "unstack_layer_params",
]
