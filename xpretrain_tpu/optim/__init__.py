from xpretrain_tpu.optim.optimizer import (
    NO_DECAY_DEFAULT,
    NO_DECAY_LFVILA,
    build_optimizer,
    cast_params_for_storage,
    master_weights,
    moment_dtype_from_cfg,
    param_dtype_from_cfg,
    param_group_labels,
)
from xpretrain_tpu.optim.schedules import AutoStep, get_schedule

__all__ = [
    "build_optimizer",
    "cast_params_for_storage",
    "master_weights",
    "moment_dtype_from_cfg",
    "param_dtype_from_cfg",
    "param_group_labels",
    "get_schedule",
    "AutoStep",
    "NO_DECAY_DEFAULT",
    "NO_DECAY_LFVILA",
]
