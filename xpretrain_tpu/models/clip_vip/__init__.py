from xpretrain_tpu.models.clip_vip.model import (
    CLIPTextConfig,
    CLIPVipConfig,
    CLIPVisionConfig,
    CLIPViPModel,
    VipConfig,
)

__all__ = [
    "CLIPTextConfig",
    "CLIPVisionConfig",
    "CLIPVipConfig",
    "VipConfig",
    "CLIPViPModel",
]
