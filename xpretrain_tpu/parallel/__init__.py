from xpretrain_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    replicated_sharding,
)
from xpretrain_tpu.parallel.tensor_parallel import (
    hybrid_state_shardings,
    tp_param_shardings,
    tp_pspec,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicated_sharding",
    "hybrid_state_shardings",
    "tp_param_shardings",
    "tp_pspec",
]
