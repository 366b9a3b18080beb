from spectrogramgenai_tpu.ops.mel_kernel import fused_logmel, fused_mel_power

__all__ = ["fused_logmel", "fused_mel_power"]
