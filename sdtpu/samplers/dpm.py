"""DPM-Solver++ (2M) — second-order multistep ODE solver, the modern
high-quality few-step sampler (15-25 steps at DDPM-50 quality).  New
capability over the reference (DDPM-only).

Data-prediction formulation with alpha_t = sqrt(abar), sigma_t =
sqrt(1-abar), lambda_t = ln(alpha/sigma), h_i = lambda_{t_next} -
lambda_{t_i}:

    first step (order 1):   x_next = c1 * x + c2 * x0(x, eps)
    later steps (order 2):  D = x0 + (1/(2 r_i)) * (x0 - x0_prev),
                            x_next = c1 * x + c2 * D
    c1 = sigma_next / sigma_t,  c2 = -alpha_next * expm1(-h_i),
    r_i = h_{i-1} / h_i.

The final step targets t=0 (sigma=0, alpha=1): c1 = 0, c2 = 1, i.e. the
update returns the (second-order-corrected) predicted x0 exactly.

Multistep: the scan carries the previous step's x0_hat (the ``state``
slot of the sampler protocol; ``SamplerDef.multistep = True``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import SchedulerConfig
from sdtpu.samplers.ddpm import inference_timesteps, make_alphas_cumprod


@dataclasses.dataclass(frozen=True)
class DPMSchedule:
    timesteps: jax.Array
    sqrt_alpha_prod: jax.Array            # alpha_t   (S,)
    sqrt_one_minus_alpha_prod: jax.Array  # sigma_t   (S,)
    c1: jax.Array                          # sigma_next / sigma_t
    c2: jax.Array                          # -alpha_next * expm1(-h)
    inv_2r: jax.Array                      # 1 / (2 r_i); 0 at the first step
    prediction_type: str = "epsilon"

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_schedule(
    config: SchedulerConfig,
    num_inference_steps: int,
    strength: float = 1.0,
    *,
    karras: bool = False,
) -> DPMSchedule:
    if karras:
        from sdtpu.samplers.ddpm import karras_sigma_grid

        sig_ve, tsf = karras_sigma_grid(config, num_inference_steps, strength)
        # VE sigma -> VP (alpha, sigma): alpha = 1/sqrt(s^2+1), sigma = s*alpha
        alpha = 1.0 / np.sqrt(sig_ve**2 + 1.0)
        sigma = sig_ve * alpha
        ts = jnp.asarray(tsf, dtype=jnp.float32)  # fractional timesteps
    else:
        ac = make_alphas_cumprod(config)
        ts_i = inference_timesteps(config, num_inference_steps, strength)
        alpha = np.sqrt(ac[ts_i])
        sigma = np.sqrt(1.0 - ac[ts_i])
        ts = jnp.asarray(ts_i, dtype=jnp.int32)
    lam = np.log(alpha / sigma)
    # target lambda of each step: next entry; final step targets t=0
    # (sigma -> 0, lambda -> +inf); handle by explicit limits.
    lam_next = np.concatenate([lam[1:], [np.inf]])
    alpha_next = np.concatenate([alpha[1:], [1.0]])
    sigma_next = np.concatenate([sigma[1:], [0.0]])
    h = lam_next - lam
    c1 = sigma_next / sigma
    with np.errstate(over="ignore"):
        c2 = -alpha_next * np.expm1(-h)  # h=inf -> expm1(-inf) = -1 -> c2=alpha_next
    # r_i = h_{i-1} / h_i; first step has no history -> inv_2r = 0 (order 1)
    h_prev = np.concatenate([[np.nan], h[:-1]])
    with np.errstate(invalid="ignore", divide="ignore"):
        inv_2r = np.where(np.isfinite(h_prev), h / (2.0 * h_prev), 0.0)
    inv_2r[0] = 0.0
    inv_2r = np.nan_to_num(inv_2r, nan=0.0, posinf=0.0, neginf=0.0)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
    return DPMSchedule(
        timesteps=ts,
        sqrt_alpha_prod=f32(alpha),
        sqrt_one_minus_alpha_prod=f32(sigma),
        c1=f32(c1),
        c2=f32(c2),
        inv_2r=f32(inv_2r),
        prediction_type=config.prediction_type,
    )


def dpm_step(
    schedule: DPMSchedule,
    step_index: jax.Array,
    latents: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,  # unused (deterministic); protocol parity
    state: jax.Array,  # previous x0_hat
):
    del noise
    from sdtpu.samplers.ddpm import pred_x0_from_model_output

    x = latents.astype(jnp.float32)
    e = eps_pred.astype(jnp.float32)
    x0 = pred_x0_from_model_output(schedule, step_index, x, e)
    # second-order correction vanishes at the first step (inv_2r[0] == 0)
    d = x0 + schedule.inv_2r[step_index] * (x0 - state.astype(jnp.float32))
    x_next = schedule.c1[step_index] * x + schedule.c2[step_index] * d
    return x_next.astype(latents.dtype), x0.astype(latents.dtype)


def state_init(latents: jax.Array) -> jax.Array:
    return jnp.zeros_like(latents)


def add_noise(schedule: DPMSchedule, x0, noise, step_index: int = 0):
    sa = schedule.sqrt_alpha_prod[step_index]
    sb = schedule.sqrt_one_minus_alpha_prod[step_index]
    out = sa * x0.astype(jnp.float32) + sb * noise.astype(jnp.float32)
    return out.astype(x0.dtype)
