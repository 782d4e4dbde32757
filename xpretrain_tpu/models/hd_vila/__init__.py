from xpretrain_tpu.models.hd_vila.resnet import ResNet
from xpretrain_tpu.models.hd_vila.timesformer import TimeSformer

__all__ = ["ResNet", "TimeSformer"]
