from xpretrain_tpu.optim.optimizer import (
    NO_DECAY_DEFAULT,
    NO_DECAY_LFVILA,
    build_optimizer,
    param_group_labels,
)
from xpretrain_tpu.optim.schedules import AutoStep, get_schedule

__all__ = [
    "build_optimizer",
    "param_group_labels",
    "get_schedule",
    "AutoStep",
    "NO_DECAY_DEFAULT",
    "NO_DECAY_LFVILA",
]
