"""Euler discrete sampler (sigma-space), the few-step scheduler used by
SDXL-Turbo-style serving (BASELINE config 5).  New capability over the
reference (DDPM-only).

sigma_t = sqrt((1 - a_t) / a_t); model input is scaled by
1/sqrt(sigma^2 + 1); the update is one Euler step along
d = (x - sigma * eps) derivative:  x_prev = x + (sigma_prev - sigma) * d/dx.

Exposes the same scan protocol as ddpm/ddim plus ``input_scale`` and
``init_sigma`` (Euler latents start at noise * sigma_max).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import SchedulerConfig
from sdtpu.samplers.ddpm import inference_timesteps, make_alphas_cumprod


@dataclasses.dataclass(frozen=True)
class EulerSchedule:
    timesteps: jax.Array
    sigmas: jax.Array       # (S+1,), ends with 0
    input_scale: jax.Array  # (S,): 1/sqrt(sigma^2+1)
    init_sigma: float
    # "epsilon" or "v_prediction" (SD 2.1); the step converts accordingly.
    prediction_type: str = "epsilon"

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    # interface parity with DDPM/DDIM
    @property
    def sqrt_alpha_prod(self):
        s = self.sigmas[:-1]
        return 1.0 / jnp.sqrt(s**2 + 1.0)

    @property
    def sqrt_one_minus_alpha_prod(self):
        s = self.sigmas[:-1]
        return s / jnp.sqrt(s**2 + 1.0)


def make_schedule(
    config: SchedulerConfig,
    num_inference_steps: int,
    strength: float = 1.0,
    *,
    karras: bool = False,
) -> EulerSchedule:
    if karras:
        from sdtpu.samplers.ddpm import karras_sigma_grid

        sig, tsf = karras_sigma_grid(config, num_inference_steps, strength)
        ts = jnp.asarray(tsf, dtype=jnp.float32)  # fractional timesteps
    else:
        from sdtpu.samplers.ddpm import ve_sigmas

        ac = make_alphas_cumprod(config)
        ts_i = inference_timesteps(config, num_inference_steps, strength)
        sig = ve_sigmas(ac[ts_i])  # terminal zero-SNR entry floored finite
        ts = jnp.asarray(ts_i, dtype=jnp.int32)
    sigmas = np.concatenate([sig, [0.0]])
    return EulerSchedule(
        timesteps=ts,
        sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
        input_scale=jnp.asarray(1.0 / np.sqrt(sig**2 + 1.0), dtype=jnp.float32),
        init_sigma=float(sig[0]),
        prediction_type=config.prediction_type,
    )


def scale_model_input(schedule: EulerSchedule, step_index, x):
    return x * schedule.input_scale[step_index].astype(x.dtype)


def _derivative(schedule: EulerSchedule, sigma, x, e):
    """d = (x - x0)/sigma for the schedule's prediction type."""
    if schedule.prediction_type == "v_prediction":
        # diffusers EulerDiscreteScheduler: x is the UNSCALED sample
        # (x = x0 + sigma * eps); the model saw x / sqrt(sigma^2 + 1).
        # x0 = -sigma/sqrt(sigma^2+1) * v + x/(sigma^2+1); d = (x - x0)/sigma.
        x0 = -sigma / jnp.sqrt(sigma**2 + 1.0) * e + x / (sigma**2 + 1.0)
        return (x - x0) / sigma
    # epsilon: x0 = x - sigma * eps; d = (x - x0)/sigma = eps
    return e


def euler_step(
    schedule: EulerSchedule,
    step_index: jax.Array,
    latents: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,  # unused; protocol parity
) -> jax.Array:
    del noise
    x = latents.astype(jnp.float32)
    e = eps_pred.astype(jnp.float32)
    sigma = schedule.sigmas[step_index]
    sigma_next = schedule.sigmas[step_index + 1]
    d = _derivative(schedule, sigma, x, e)
    x_prev = x + (sigma_next - sigma) * d
    return x_prev.astype(latents.dtype)


def euler_ancestral_step(
    schedule: EulerSchedule,
    step_index: jax.Array,
    latents: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Euler-ancestral (diffusers ``EulerAncestralDiscreteScheduler``): the
    deterministic Euler move goes only to ``sigma_down`` and the remaining
    variance ``sigma_up`` is re-injected as fresh noise —
    ``sigma_up^2 = sigma_next^2 (sigma^2 - sigma_next^2)/sigma^2``,
    ``sigma_down^2 = sigma_next^2 - sigma_up^2``.  At the final step
    ``sigma_next = 0`` so both vanish and the update lands on x0."""
    x = latents.astype(jnp.float32)
    e = eps_pred.astype(jnp.float32)
    sigma = schedule.sigmas[step_index]
    sigma_next = schedule.sigmas[step_index + 1]
    d = _derivative(schedule, sigma, x, e)
    up2 = sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2
    up2 = jnp.maximum(up2, 0.0)
    sigma_up = jnp.sqrt(up2)
    sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - up2, 0.0))
    x_prev = x + (sigma_down - sigma) * d \
        + sigma_up * noise.astype(jnp.float32)
    return x_prev.astype(latents.dtype)


def add_noise(schedule: EulerSchedule, x0, noise, step_index: int = 0):
    sigma = schedule.sigmas[step_index]
    out = x0.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
    return out.astype(x0.dtype)
