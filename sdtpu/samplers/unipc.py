"""UniPC (order 2, B(h)=expm1(h) "bh2") — unified predictor-corrector
multistep solver (Zhao et al. 2023), the default sampler in several
community UIs.  New capability over the reference (DDPM-only,
``sampler.mojo``); semantics match diffusers' ``UniPCMultistepScheduler``
(``solver_order=2, solver_type="bh2", predict_x0=True,
lower_order_final=True``).

Data-prediction formulation, alpha_t = sqrt(abar), sigma_t = sqrt(1-abar),
lambda_t = ln(alpha/sigma).  Each scan step, given the model output at the
(uncorrected) current sample:

  1. corrector (i >= 1): re-integrates the PREVIOUS transition
     t_{i-1} -> t_i using the current step's x0 prediction as the
     endpoint derivative —
         x_i^c = (sig_i/sig_{i-1}) x_{i-1} - a_i phi1_c m_{i-1}
                 - a_i B_c [rho_0 (m_{i-2} - m_{i-1})/r1_c
                            + rho_last (m_i - m_{i-1})]
     (order-1 warmup at i=1: the history difference term drops,
     rho_last = 1/2);
  2. predictor: advances the corrected sample over t_i -> t_{i+1} —
         x_{i+1} = (sig_next/sig_i) x_i^c - a_next phi1 m_i
                   - a_next B [1/2 (m_{i-1} - m_i)/r1]
     (order 1 at the first and last step: the bracket term drops; the
     final step has sigma_next = 0 and returns m_i = x0_hat exactly).

  with h = lam_next - lam_i, phi1 = expm1(-h), B = expm1(-h) (bh2),
  r1 = (lam_{i-1} - lam_i)/h, and for the corrector the same quantities
  over the previous transition; rho_0/rho_last solve the 2x2 system
  R rho = b with R = [[1, 1], [r1_c, 1]],
  b1 = (phi1/(-h) - 1)/B, b2 = ((phi1/(-h) - 1)/(-h) - 1/2) * 2 / B.

All coefficients depend only on the sigma grid, so they precompute on host
into per-step arrays; the in-scan step is a handful of FMAs.  The scan
state carries (m_prev, m_prev2, last_sample) — the two previous x0
predictions (always from UNCORRECTED samples, as diffusers stores them)
and the previous CORRECTED sample.

Deterministic (ODE); ``unipc-karras`` uses the Karras rho-7 sigma grid.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import SchedulerConfig
from sdtpu.samplers.ddpm import inference_timesteps, make_alphas_cumprod


@dataclasses.dataclass(frozen=True)
class UniPCSchedule:
    timesteps: jax.Array
    sqrt_alpha_prod: jax.Array            # alpha_t   (S,)
    sqrt_one_minus_alpha_prod: jax.Array  # sigma_t   (S,)
    # predictor coefficients (S,): x_next = pc1 x^c + pc2 m0 + pd (m_prev - m0)
    pc1: jax.Array
    pc2: jax.Array
    pd: jax.Array                          # 0 where the predictor is order 1
    # corrector coefficients (S,), all 0 at steps with no corrector:
    # x^c = cc1 x_{i-1} + cc2 m_prev + cc3 (m_prev2 - m_prev) + cc4 (m0 - m_prev)
    cc1: jax.Array
    cc2: jax.Array
    cc3: jax.Array
    cc4: jax.Array
    corr_on: jax.Array                     # 1.0 where the corrector runs
    prediction_type: str = "epsilon"

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def _alpha_sigma_ts(config, num_inference_steps, strength, karras):
    """(alpha_t, sigma_t, timesteps) on the inference grid — identical
    derivation to DPM++'s (sdtpu/samplers/dpm.py)."""
    if karras:
        from sdtpu.samplers.ddpm import karras_sigma_grid

        sig_ve, tsf = karras_sigma_grid(config, num_inference_steps, strength)
        alpha = 1.0 / np.sqrt(sig_ve**2 + 1.0)
        sigma = sig_ve * alpha
        ts = jnp.asarray(tsf, dtype=jnp.float32)
    else:
        ac = make_alphas_cumprod(config)
        ts_i = inference_timesteps(config, num_inference_steps, strength)
        ac_t = np.maximum(ac[ts_i], 2.0**-24)
        alpha = np.sqrt(ac_t)
        sigma = np.sqrt(1.0 - ac_t)
        ts = jnp.asarray(ts_i, dtype=jnp.int32)
    return alpha, sigma, ts


def _phi_b(h):
    """(phi1, B, b1, b2) for one transition of log-SNR length h > 0, with
    hh = -h and B(h) = expm1(hh) (the "bh2" choice)."""
    hh = -h
    phi1 = np.expm1(hh)
    B = phi1
    b1 = (phi1 / hh - 1.0) / B
    b2 = ((phi1 / hh - 1.0) / hh - 0.5) * 2.0 / B
    return phi1, B, b1, b2


def make_schedule(
    config: SchedulerConfig,
    num_inference_steps: int,
    strength: float = 1.0,
    *,
    karras: bool = False,
) -> UniPCSchedule:
    alpha, sigma, ts = _alpha_sigma_ts(
        config, num_inference_steps, strength, karras
    )
    S = alpha.shape[0]
    lam = np.log(alpha / sigma)
    alpha_next = np.concatenate([alpha[1:], [1.0]])
    sigma_next = np.concatenate([sigma[1:], [0.0]])
    lam_next = np.concatenate([lam[1:], [np.inf]])
    h = lam_next - lam  # (S,); inf at the final step

    pc1 = np.zeros(S)
    pc2 = np.zeros(S)
    pd = np.zeros(S)
    cc1 = np.zeros(S)
    cc2 = np.zeros(S)
    cc3 = np.zeros(S)
    cc4 = np.zeros(S)
    corr_on = np.zeros(S)
    for i in range(S):
        # ---- predictor over t_i -> t_{i+1} -------------------------------
        p_ord = min(2, i + 1, S - i)  # warmup + lower_order_final
        if np.isinf(h[i]):  # final step: sigma_next = 0 -> return x0_hat
            pc1[i], pc2[i] = 0.0, 1.0
        else:
            phi1, B, _, _ = _phi_b(h[i])
            pc1[i] = sigma_next[i] / sigma[i]
            pc2[i] = -alpha_next[i] * phi1
            if p_ord == 2:
                r1 = (lam[i - 1] - lam[i]) / h[i]
                pd[i] = -alpha_next[i] * B * 0.5 / r1
        # ---- corrector over t_{i-1} -> t_i -------------------------------
        if i >= 1:
            c_ord = min(2, i, S - i + 1)
            h_c = lam[i] - lam[i - 1]
            phi1c, Bc, b1, b2 = _phi_b(h_c)
            corr_on[i] = 1.0
            cc1[i] = sigma[i] / sigma[i - 1]
            cc2[i] = -alpha[i] * phi1c
            if c_ord == 1:
                cc4[i] = -alpha[i] * Bc * 0.5
            else:
                r1c = (lam[i - 2] - lam[i - 1]) / h_c
                rho0 = (b1 - b2) / (1.0 - r1c)
                rho_last = b1 - rho0
                cc3[i] = -alpha[i] * Bc * rho0 / r1c
                cc4[i] = -alpha[i] * Bc * rho_last

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
    return UniPCSchedule(
        timesteps=ts,
        sqrt_alpha_prod=f32(alpha),
        sqrt_one_minus_alpha_prod=f32(sigma),
        pc1=f32(pc1),
        pc2=f32(pc2),
        pd=f32(pd),
        cc1=f32(cc1),
        cc2=f32(cc2),
        cc3=f32(cc3),
        cc4=f32(cc4),
        corr_on=f32(corr_on),
        prediction_type=config.prediction_type,
    )


def unipc_step(
    schedule: UniPCSchedule,
    step_index: jax.Array,
    latents: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,  # unused (deterministic ODE)
    state,  # (m_prev, m_prev2, last_sample)
):
    from sdtpu.samplers.ddpm import pred_x0_from_model_output

    m_prev, m_prev2, last_sample = (s.astype(jnp.float32) for s in state)
    i = step_index
    x = latents.astype(jnp.float32)
    e = eps_pred.astype(jnp.float32)
    m0 = pred_x0_from_model_output(schedule, i, x, e)
    # corrector: re-land the previous transition with m0 as the endpoint
    # derivative (coefficients are all zero at steps without a corrector,
    # but blend through corr_on so the i=0 garbage state can't leak NaNs)
    xc = (
        schedule.cc1[i] * last_sample
        + schedule.cc2[i] * m_prev
        + schedule.cc3[i] * (m_prev2 - m_prev)
        + schedule.cc4[i] * (m0 - m_prev)
    )
    xc = schedule.corr_on[i] * xc + (1.0 - schedule.corr_on[i]) * x
    # predictor
    x_next = (
        schedule.pc1[i] * xc
        + schedule.pc2[i] * m0
        + schedule.pd[i] * (m_prev - m0)
    )
    dt = latents.dtype
    return x_next.astype(dt), (m0.astype(dt), m_prev.astype(dt), xc.astype(dt))


def state_init(latents: jax.Array):
    z = jnp.zeros_like(latents)
    return (z, z, z)


def add_noise(schedule: UniPCSchedule, x0, noise, step_index: int = 0):
    sa = schedule.sqrt_alpha_prod[step_index]
    sb = schedule.sqrt_one_minus_alpha_prod[step_index]
    out = sa * x0.astype(jnp.float32) + sb * noise.astype(jnp.float32)
    return out.astype(x0.dtype)
