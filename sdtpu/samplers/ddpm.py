"""DDPM sampler (reference: ``sampler.mojo``).

Same math as the reference's ``DDPMSampler`` — scaled-linear betas
(``sampler.mojo:28-30``), diffusers-style timestep spacing
(``sampler.mojo:35-44``), epsilon-prediction posterior step
(``sampler.mojo:75-109``), img2img ``set_strength``/``add_noise``
(``sampler.mojo:67-73,111-124``) — restructured for ``lax.scan``: everything
that depends on the step index is precomputed into arrays indexed inside the
scan, so the full denoise loop compiles into one XLA program with no host
round-trips (the reference steps from a host loop, ``pipeline.mojo:87-122``).

Fixes kept deliberately (SURVEY.md §5.1): 1000 train timesteps instead of the
demo-scale 10 (``sampler.mojo:19``); N(0,1) noise via ``jax.random.normal``
instead of uniform [1, 1e7] (``utils.mojo:563-575``); ``set_strength`` cannot
overrun the timestep array (``sampler.mojo:72``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import SchedulerConfig


def make_betas(config: SchedulerConfig) -> np.ndarray:
    if config.beta_schedule == "scaled_linear":
        # linspace(sqrt(b0), sqrt(b1), N)^2 (sampler.mojo:28-30)
        betas = (
            np.linspace(
                config.beta_start**0.5,
                config.beta_end**0.5,
                config.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif config.beta_schedule == "linear":
        betas = np.linspace(
            config.beta_start,
            config.beta_end,
            config.num_train_timesteps,
            dtype=np.float64,
        )
    else:
        raise ValueError(f"unknown beta schedule {config.beta_schedule!r}")
    if config.rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)
    return betas


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the TERMINAL training step carries zero signal
    (SNR = 0): shift-and-scale sqrt(alpha_bar) so its last entry is exactly
    0 while the first is preserved ("Common Diffusion Noise Schedules and
    Sample Steps are Flawed", Lin et al. 2023, alg. 1; diffusers
    ``rescale_zero_terminal_snr``).  Only meaningful for v-prediction
    models fine-tuned with it (epsilon is undefined at SNR 0)."""
    abar_sqrt = np.sqrt(np.cumprod(1.0 - betas))
    a0, aT = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = (abar_sqrt - aT) * (a0 / (a0 - aT))
    abar = abar_sqrt**2
    alphas = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1.0 - alphas


def make_alphas_cumprod(config: SchedulerConfig) -> np.ndarray:
    return np.cumprod(1.0 - make_betas(config))


def ve_sigmas(alphas_cumprod: np.ndarray) -> np.ndarray:
    """alpha_bar -> VE-convention sigma = sqrt((1-abar)/abar).  The terminal
    zero-SNR entry (abar == 0) is floored at 2**-24 exactly as diffusers'
    EulerDiscreteScheduler does, so sigma-space samplers get a finite
    sigma_max instead of inf."""
    ac = np.maximum(alphas_cumprod, 2.0**-24)
    return np.sqrt((1.0 - ac) / ac)


def inference_timesteps(
    config: SchedulerConfig, num_inference_steps: int, strength: float = 1.0
) -> np.ndarray:
    """Descending timesteps, truncated for img2img strength: start at step
    ``n - int(n * strength)`` (sampler.mojo:67-73) — bounds-checked, unlike
    the reference.

    Spacing follows ``config.timestep_spacing`` (diffusers semantics):
    "leading" — ``round(arange(n)[::-1] * (N // n)) + steps_offset``
    (sampler.mojo:35-44, the SD 1.x default); "trailing" — grid ends at the
    terminal timestep N-1 (Lin et al. 2023; required for zero-terminal-SNR
    checkpoints); "linspace" — even endpoints-inclusive grid."""
    n = num_inference_steps
    N = config.num_train_timesteps
    if config.timestep_spacing == "trailing":
        ts = np.round(np.arange(N, 0, -N / n)).astype(np.int64) - 1
    elif config.timestep_spacing == "linspace":
        ts = np.linspace(0, N - 1, n).round().astype(np.int64)[::-1]
    elif config.timestep_spacing == "leading":
        ratio = N // n
        ts = (np.arange(n)[::-1] * ratio).round().astype(np.int64)
        ts += config.steps_offset
    else:
        raise ValueError(
            f"unknown timestep_spacing {config.timestep_spacing!r}"
        )
    start = min(max(n - int(n * strength), 0), n - 1)
    return ts[start:]


def karras_sigma_grid(
    config: SchedulerConfig,
    num_inference_steps: int,
    strength: float = 1.0,
    rho: float = 7.0,
):
    """Karras et al. (2022) sigma spacing over the (strength-truncated)
    inference window, in the VE convention sigma = sqrt((1-abar)/abar):
    rho-7 interpolation concentrates steps at low noise, the standard
    quality-per-step improvement for Euler/DPM++ at <= 25 steps.

    Returns (sigmas, timesteps): descending (S,) float64 arrays; timesteps
    are FRACTIONAL (log-sigma interpolation against the training grid,
    exactly diffusers' ``use_karras_sigmas=True`` semantics)."""
    ac = make_alphas_cumprod(config)
    full = ve_sigmas(ac)  # (N,), increasing in t
    ts = inference_timesteps(config, num_inference_steps, strength)
    smax, smin = full[ts[0]], full[ts[-1]]
    ramp = np.linspace(0.0, 1.0, len(ts))
    inv = 1.0 / rho
    sig = (smax**inv + ramp * (smin**inv - smax**inv)) ** rho
    t = np.interp(np.log(sig), np.log(full), np.arange(len(full)))
    return sig, t


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Per-inference-step coefficient arrays, all shaped (S,), f32 — the
    scan carries only the step index."""

    timesteps: jax.Array  # int32, descending
    coeff_x0: jax.Array  # sqrt(alpha_prod_prev) * current_beta / (1 - alpha_prod_t)
    coeff_xt: jax.Array  # sqrt(current_alpha) * (1 - alpha_prod_prev) / (1 - alpha_prod_t)
    sqrt_alpha_prod: jax.Array
    sqrt_one_minus_alpha_prod: jax.Array
    sigma: jax.Array  # sqrt(variance), already zeroed at t == 0
    # "epsilon" (SD 1.x/Tiny-SD/SDXL) or "v_prediction" (SD 2.x-style)
    prediction_type: str = "epsilon"

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def pred_x0_from_model_output(
    schedule, step_index, latents_f32, model_out_f32
):
    """x0_hat from the model output under the configured parameterization:
    epsilon: x0 = (x - sqrt(1-a) eps) / sqrt(a)
    v_prediction: x0 = sqrt(a) x - sqrt(1-a) v
    """
    sa = schedule.sqrt_alpha_prod[step_index]
    sb = schedule.sqrt_one_minus_alpha_prod[step_index]
    if schedule.prediction_type == "v_prediction":
        return sa * latents_f32 - sb * model_out_f32
    return (latents_f32 - sb * model_out_f32) / sa


def make_schedule(
    config: SchedulerConfig,
    num_inference_steps: int,
    strength: float = 1.0,
) -> DDPMSchedule:
    alphas_cumprod = make_alphas_cumprod(config)
    ts = inference_timesteps(config, num_inference_steps, strength)
    prev_ts = ts - config.num_train_timesteps // num_inference_steps

    alpha_prod_t = alphas_cumprod[ts]
    alpha_prod_prev = np.where(prev_ts >= 0, alphas_cumprod[np.maximum(prev_ts, 0)], 1.0)
    current_alpha = alpha_prod_t / alpha_prod_prev
    current_beta = 1.0 - current_alpha

    beta_prod_t = 1.0 - alpha_prod_t
    coeff_x0 = np.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
    coeff_xt = np.sqrt(current_alpha) * (1.0 - alpha_prod_prev) / beta_prod_t

    # variance floored at 1e-20 (sampler.mojo:53-65); no noise at t == 0
    # (sampler.mojo:101-108).
    variance = np.clip(
        (1.0 - alpha_prod_prev) / beta_prod_t * current_beta, 1e-20, None
    )
    sigma = np.where(ts > 0, np.sqrt(variance), 0.0)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
    return DDPMSchedule(
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        coeff_x0=f32(coeff_x0),
        coeff_xt=f32(coeff_xt),
        sqrt_alpha_prod=f32(np.sqrt(alpha_prod_t)),
        sqrt_one_minus_alpha_prod=f32(np.sqrt(beta_prod_t)),
        sigma=f32(sigma),
        prediction_type=config.prediction_type,
    )


def ddpm_step(
    schedule: DDPMSchedule,
    step_index: jax.Array,
    latents: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """One posterior step x_t -> x_{t-1} (sampler.mojo:75-109):
    x0_hat from the model output (epsilon or v parameterization);
    x_prev = c0·x0_hat + c1·x + sigma·z.
    Math in f32; result cast back to the latents dtype."""
    x = latents.astype(jnp.float32)
    e = eps_pred.astype(jnp.float32)
    x0_hat = pred_x0_from_model_output(schedule, step_index, x, e)
    x_prev = schedule.coeff_x0[step_index] * x0_hat + schedule.coeff_xt[step_index] * x
    x_prev = x_prev + schedule.sigma[step_index] * noise.astype(jnp.float32)
    return x_prev.astype(latents.dtype)


def add_noise(
    schedule: DDPMSchedule,
    x0: jax.Array,
    noise: jax.Array,
    step_index: int = 0,
) -> jax.Array:
    """Forward-noise x0 to the schedule's step_index timestep:
    sqrt(a)·x0 + sqrt(1-a)·z (sampler.mojo:111-124).  img2img uses
    step_index=0, the first (strength-truncated) inference step."""
    sa = schedule.sqrt_alpha_prod[step_index]
    sb = schedule.sqrt_one_minus_alpha_prod[step_index]
    out = sa * x0.astype(jnp.float32) + sb * noise.astype(jnp.float32)
    return out.astype(x0.dtype)
