"""Samplers (the reference's L3 scheduler layer, ``sampler.mojo``)."""

from sdtpu.samplers.ddpm import (
    DDPMSchedule,
    add_noise,
    ddpm_step,
    inference_timesteps,
    make_alphas_cumprod,
    make_betas,
    make_schedule,
)

__all__ = [
    "DDPMSchedule",
    "add_noise",
    "ddpm_step",
    "inference_timesteps",
    "make_alphas_cumprod",
    "make_betas",
    "make_schedule",
]
