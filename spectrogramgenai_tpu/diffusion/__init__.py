from spectrogramgenai_tpu.diffusion.ddpm import (
    DiffusionSchedule,
    linear_schedule,
    q_sample,
    diffusion_loss,
    ddpm_sample,
    ddim_sample,
    dpmpp_sample,
    to_uint8,
)

__all__ = [
    "DiffusionSchedule",
    "linear_schedule",
    "q_sample",
    "diffusion_loss",
    "ddpm_sample",
    "ddim_sample",
    "dpmpp_sample",
    "to_uint8",
]
