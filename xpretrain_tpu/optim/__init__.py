from xpretrain_tpu.optim.optimizer import build_optimizer, param_group_labels
from xpretrain_tpu.optim.schedules import AutoStep, get_schedule

__all__ = ["build_optimizer", "param_group_labels", "get_schedule", "AutoStep"]
