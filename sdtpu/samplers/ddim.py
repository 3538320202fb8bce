"""DDIM sampler — deterministic (eta=0) variant sharing the DDPM beta
schedule and timestep spacing (``sampler.mojo:28-44``); a new capability over
the reference, which only implements DDPM.

x_prev = sqrt(a_prev) * x0_hat + sqrt(1 - a_prev) * eps_hat
with x0_hat = (x - sqrt(1-a_t) * eps_hat) / sqrt(a_t).

Same scan-friendly shape as :mod:`sdtpu.samplers.ddpm`: per-step coefficient
arrays indexed inside the scan.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import SchedulerConfig
from sdtpu.samplers.ddpm import inference_timesteps, make_alphas_cumprod


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    timesteps: jax.Array
    sqrt_alpha_prod: jax.Array
    sqrt_one_minus_alpha_prod: jax.Array
    sqrt_alpha_prod_prev: jax.Array
    sqrt_one_minus_alpha_prod_prev: jax.Array
    # eta = 0: no noise injected; sigma kept for interface parity
    sigma: jax.Array
    prediction_type: str = "epsilon"

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_schedule(
    config: SchedulerConfig,
    num_inference_steps: int,
    strength: float = 1.0,
) -> DDIMSchedule:
    ac = make_alphas_cumprod(config)
    ts = inference_timesteps(config, num_inference_steps, strength)
    prev_ts = ts - config.num_train_timesteps // num_inference_steps
    a_t = ac[ts]
    a_prev = np.where(prev_ts >= 0, ac[np.maximum(prev_ts, 0)], 1.0)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
    return DDIMSchedule(
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        sqrt_alpha_prod=f32(np.sqrt(a_t)),
        sqrt_one_minus_alpha_prod=f32(np.sqrt(1.0 - a_t)),
        sqrt_alpha_prod_prev=f32(np.sqrt(a_prev)),
        sqrt_one_minus_alpha_prod_prev=f32(np.sqrt(1.0 - a_prev)),
        sigma=f32(np.zeros_like(a_t)),
        prediction_type=config.prediction_type,
    )


def ddim_step(
    schedule: DDIMSchedule,
    step_index: jax.Array,
    latents: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,  # unused (eta=0); kept for the sampler protocol
) -> jax.Array:
    del noise
    from sdtpu.samplers.ddpm import pred_x0_from_model_output

    x = latents.astype(jnp.float32)
    e = eps_pred.astype(jnp.float32)
    sa = schedule.sqrt_alpha_prod[step_index]
    sb = schedule.sqrt_one_minus_alpha_prod[step_index]
    x0_hat = pred_x0_from_model_output(schedule, step_index, x, e)
    # direction term always uses the epsilon form; recover eps under
    # v-parameterization: eps = sqrt(a) v + sqrt(1-a) x
    if schedule.prediction_type == "v_prediction":
        e = sa * e + sb * x
    x_prev = (
        schedule.sqrt_alpha_prod_prev[step_index] * x0_hat
        + schedule.sqrt_one_minus_alpha_prod_prev[step_index] * e
    )
    return x_prev.astype(latents.dtype)


def add_noise(schedule: DDIMSchedule, x0, noise, step_index: int = 0):
    sa = schedule.sqrt_alpha_prod[step_index]
    sb = schedule.sqrt_one_minus_alpha_prod[step_index]
    out = sa * x0.astype(jnp.float32) + sb * noise.astype(jnp.float32)
    return out.astype(x0.dtype)
