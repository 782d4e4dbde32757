from xpretrain_tpu.ops import losses
from xpretrain_tpu.ops.losses import build_loss_fn

__all__ = ["losses", "build_loss_fn"]
