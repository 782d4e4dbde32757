from xpretrain_tpu.ops import losses
from xpretrain_tpu.ops.losses import build_loss_fn
from xpretrain_tpu.ops.quant import int8_serving, maybe_int8_serving
from xpretrain_tpu.ops.ring_attention import make_ring_attention

__all__ = [
    "losses", "build_loss_fn", "int8_serving", "maybe_int8_serving",
    "make_ring_attention",
]
