from xpretrain_tpu.utils.basic import (
    AverageMeter,
    flat_list_of_lists,
    load_json,
    load_jsonl,
    save_json,
    save_jsonl,
)
from xpretrain_tpu.utils.logging import LOGGER, RunningMeter, ScalarWriter, setup_logging
from xpretrain_tpu.utils.metrics import compute_metrics, compute_metrics_multi, dsl_renormalize

__all__ = [
    "AverageMeter",
    "flat_list_of_lists",
    "load_json",
    "load_jsonl",
    "save_json",
    "save_jsonl",
    "LOGGER",
    "RunningMeter",
    "ScalarWriter",
    "setup_logging",
    "compute_metrics",
    "compute_metrics_multi",
    "dsl_renormalize",
]
