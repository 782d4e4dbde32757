from xpretrain_tpu.data.sample_frames import FrameSampler, uniform_sample_with_jitter

__all__ = ["FrameSampler", "uniform_sample_with_jitter"]
