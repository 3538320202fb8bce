"""LCM (Latent Consistency Model) scheduler — 1-8 step distilled sampling
(BASELINE config 5: "few-step distilled ... large-batch serving").  New
capability over the reference.

Per-step update (consistency boundary conditions, sigma_data = 0.5,
timestep_scaling = 10):

    x0_hat   = (x - sqrt(1-a_t) eps) / sqrt(a_t)
    denoised = c_out(t) * x0_hat + c_skip(t) * x
    x_prev   = sqrt(a_prev) * denoised + sqrt(1-a_prev) * z   (fresh z; none
               on the final step)

Timesteps follow the distillation ladder: ``origin_steps`` (default 50)
evenly spaced training timesteps, subsampled to ``num_inference_steps``.
LCM-distilled UNets consume the guidance scale as an embedding
(``UNetConfig.time_cond_proj_dim``) instead of CFG batching.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import SchedulerConfig
from sdtpu.samplers.ddpm import make_alphas_cumprod

SIGMA_DATA = 0.5
TIMESTEP_SCALING = 10.0


@dataclasses.dataclass(frozen=True)
class LCMSchedule:
    timesteps: jax.Array
    sqrt_alpha_prod: jax.Array
    sqrt_one_minus_alpha_prod: jax.Array
    sqrt_alpha_prod_prev: jax.Array
    sqrt_one_minus_alpha_prod_prev: jax.Array
    c_skip: jax.Array
    c_out: jax.Array
    noise_mask: jax.Array  # 1.0 except the final step
    prediction_type: str = "epsilon"

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_schedule(
    config: SchedulerConfig,
    num_inference_steps: int,
    strength: float = 1.0,
    *,
    origin_steps: int = 50,
) -> LCMSchedule:
    ac = make_alphas_cumprod(config)
    k = config.num_train_timesteps // origin_steps
    ladder = (np.arange(1, origin_steps + 1) * k - 1)  # ascending
    skip = max(len(ladder) // num_inference_steps, 1)
    ts = ladder[::-1][::skip][:num_inference_steps]
    # img2img strength truncation (same semantics as ddpm)
    start = min(max(len(ts) - int(len(ts) * strength), 0), len(ts) - 1)
    ts = ts[start:]

    prev = np.concatenate([ts[1:], [0]])  # next (lower) timestep; 0 at end
    a_t, a_prev = ac[ts], ac[prev]
    scaled = ts.astype(np.float64) * TIMESTEP_SCALING
    c_skip = SIGMA_DATA**2 / (scaled**2 + SIGMA_DATA**2)
    c_out = scaled / np.sqrt(scaled**2 + SIGMA_DATA**2)
    noise_mask = np.ones(len(ts))
    noise_mask[-1] = 0.0

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
    return LCMSchedule(
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        sqrt_alpha_prod=f32(np.sqrt(a_t)),
        sqrt_one_minus_alpha_prod=f32(np.sqrt(1 - a_t)),
        sqrt_alpha_prod_prev=f32(np.sqrt(a_prev)),
        sqrt_one_minus_alpha_prod_prev=f32(np.sqrt(1 - a_prev)),
        c_skip=f32(c_skip),
        c_out=f32(c_out),
        noise_mask=f32(noise_mask),
        prediction_type=config.prediction_type,
    )


def lcm_step(
    schedule: LCMSchedule,
    step_index: jax.Array,
    latents: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    from sdtpu.samplers.ddpm import pred_x0_from_model_output

    x = latents.astype(jnp.float32)
    e = eps_pred.astype(jnp.float32)
    x0_hat = pred_x0_from_model_output(schedule, step_index, x, e)
    denoised = (
        schedule.c_out[step_index] * x0_hat + schedule.c_skip[step_index] * x
    )
    mask = schedule.noise_mask[step_index]
    x_prev = (
        schedule.sqrt_alpha_prod_prev[step_index] * denoised
        + schedule.sqrt_one_minus_alpha_prod_prev[step_index]
        * noise.astype(jnp.float32)
    )
    out = mask * x_prev + (1.0 - mask) * denoised
    return out.astype(latents.dtype)


def add_noise(schedule: LCMSchedule, x0, noise, step_index: int = 0):
    sa = schedule.sqrt_alpha_prod[step_index]
    sb = schedule.sqrt_one_minus_alpha_prod[step_index]
    out = sa * x0.astype(jnp.float32) + sb * noise.astype(jnp.float32)
    return out.astype(x0.dtype)
