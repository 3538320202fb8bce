"""DPM-Solver++ (2M) — second-order multistep solver, the modern
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

The SDE variant (``sde=True``; diffusers ``algorithm_type=
"sde-dpmsolver++"``, midpoint solver — the community "DPM++ 2M SDE")
keeps the same midpoint correction D but integrates the reverse SDE,
injecting fresh noise each step:

    c1 = (sigma_next / sigma_t) * exp(-h_i)
    c2 = -alpha_next * expm1(-2 h_i)
    c3 = sigma_next * sqrt(-expm1(-2 h_i))       (noise coefficient)
    x_next = c1 * x + c2 * D + c3 * z,  z ~ N(0, 1)

The final step targets t=0 (sigma=0, alpha=1): c1 = 0, c2 = 1, c3 = 0,
i.e. the update returns the predicted x0 exactly (the ``inv_2r``
nan_to_num zeroes the infinite-h correction — diffusers'
``lower_order_final`` behavior).

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
    c1: jax.Array                          # sigma_next / sigma_t [* exp(-h)]
    c2: jax.Array                          # -alpha_next * expm1(-h) [or -2h]
    c3: jax.Array                          # SDE noise coeff; zeros for ODE
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
    sde: bool = False,
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
        # floor the terminal zero-SNR abar (2**-24, as diffusers' Euler
        # does) so lambda = log(alpha/sigma) stays finite and the 2nd
        # step's r = h_prev/h ratio is well-defined
        ac_t = np.maximum(ac[ts_i], 2.0**-24)
        alpha = np.sqrt(ac_t)
        sigma = np.sqrt(1.0 - ac_t)
        ts = jnp.asarray(ts_i, dtype=jnp.int32)
    lam = np.log(alpha / sigma)
    # target lambda of each step: next entry; final step targets t=0
    # (sigma -> 0, lambda -> +inf); handle by explicit limits.
    lam_next = np.concatenate([lam[1:], [np.inf]])
    alpha_next = np.concatenate([alpha[1:], [1.0]])
    sigma_next = np.concatenate([sigma[1:], [0.0]])
    h = lam_next - lam
    with np.errstate(over="ignore"):
        if sde:
            c1 = (sigma_next / sigma) * np.exp(-h)  # h=inf -> 0
            c2 = -alpha_next * np.expm1(-2.0 * h)
            c3 = sigma_next * np.sqrt(-np.expm1(-2.0 * h))
        else:
            c1 = sigma_next / sigma
            c2 = -alpha_next * np.expm1(-h)  # h=inf -> expm1(-inf) = -1 -> c2=alpha_next
            c3 = np.zeros_like(c2)
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
        c3=f32(c3),
        inv_2r=f32(inv_2r),
        prediction_type=config.prediction_type,
    )


def dpm_step(
    schedule: DPMSchedule,
    step_index: jax.Array,
    latents: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,  # zeros for the ODE variant (c3 == 0 regardless)
    state: jax.Array,  # previous x0_hat
):
    from sdtpu.samplers.ddpm import pred_x0_from_model_output

    x = latents.astype(jnp.float32)
    e = eps_pred.astype(jnp.float32)
    x0 = pred_x0_from_model_output(schedule, step_index, x, e)
    # second-order correction vanishes at the first step (inv_2r[0] == 0)
    d = x0 + schedule.inv_2r[step_index] * (x0 - state.astype(jnp.float32))
    x_next = schedule.c1[step_index] * x + schedule.c2[step_index] * d
    x_next = x_next + schedule.c3[step_index] * noise.astype(jnp.float32)
    return x_next.astype(latents.dtype), x0.astype(latents.dtype)


def state_init(latents: jax.Array) -> jax.Array:
    return jnp.zeros_like(latents)


def add_noise(schedule: DPMSchedule, x0, noise, step_index: int = 0):
    sa = schedule.sqrt_alpha_prod[step_index]
    sb = schedule.sqrt_one_minus_alpha_prod[step_index]
    out = sa * x0.astype(jnp.float32) + sb * noise.astype(jnp.float32)
    return out.astype(x0.dtype)
