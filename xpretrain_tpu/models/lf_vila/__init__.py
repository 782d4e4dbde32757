from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig, SwinTransformer3D

__all__ = ["Swin3DConfig", "SwinTransformer3D"]
