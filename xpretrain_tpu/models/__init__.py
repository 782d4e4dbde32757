"""Model families: CLIP-ViP, HD-VILA, LF-VILA, and the shared staged BERT."""

from xpretrain_tpu.models.bert import BertConfig, StagedBertModel
from xpretrain_tpu.models.clip_vip import CLIPVipConfig, CLIPViPModel
from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoder, HdVilaEncoderConfig
from xpretrain_tpu.models.hd_vila.modeling import HdVilaForPreTraining, HdVilaModelConfig
from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain
from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig, SwinTransformer3D

__all__ = [
    "BertConfig",
    "StagedBertModel",
    "CLIPVipConfig",
    "CLIPViPModel",
    "HdVilaEncoder",
    "HdVilaEncoderConfig",
    "HdVilaForPreTraining",
    "HdVilaModelConfig",
    "LfVilaConfig",
    "LfVilaPretrain",
    "Swin3DConfig",
    "SwinTransformer3D",
]
