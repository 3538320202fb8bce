"""Samplers (the reference's L3 scheduler layer, ``sampler.mojo``).

All samplers share one scan protocol so the pipeline is sampler-agnostic:
``make_schedule(config, steps, strength)`` returns a pytree of per-step
arrays; ``step(schedule, i, latents, eps, noise)`` is pure; ``add_noise``
forward-noises for img2img; optional ``scale_model_input`` and
``schedule.init_sigma`` cover sigma-space samplers (Euler).
"""

import dataclasses
import functools
from typing import Callable, Optional

from sdtpu.samplers import ddim as _ddim
from sdtpu.samplers import dpm as _dpm
from sdtpu.samplers import euler as _euler
from sdtpu.samplers import lcm as _lcm
from sdtpu.samplers import unipc as _unipc
from sdtpu.samplers.ddpm import (
    DDPMSchedule,
    add_noise,
    ddpm_step,
    inference_timesteps,
    make_alphas_cumprod,
    make_betas,
    make_schedule,
)


@dataclasses.dataclass(frozen=True)
class SamplerDef:
    make_schedule: Callable
    step: Callable
    add_noise: Callable
    scale_model_input: Optional[Callable] = None
    stochastic: bool = False  # draws per-step variance noise
    # multistep solvers carry extra state through the scan:
    # step(schedule, i, lat, eps, noise, state) -> (lat, state)
    multistep: bool = False
    state_init: Optional[Callable] = None


SAMPLERS = {
    "ddpm": SamplerDef(make_schedule, ddpm_step, add_noise, stochastic=True),
    "ddim": SamplerDef(_ddim.make_schedule, _ddim.ddim_step, _ddim.add_noise),
    "euler": SamplerDef(
        _euler.make_schedule,
        _euler.euler_step,
        _euler.add_noise,
        scale_model_input=_euler.scale_model_input,
    ),
    "lcm": SamplerDef(
        _lcm.make_schedule, _lcm.lcm_step, _lcm.add_noise, stochastic=True
    ),
    "dpm++": SamplerDef(
        _dpm.make_schedule,
        _dpm.dpm_step,
        _dpm.add_noise,
        multistep=True,
        state_init=_dpm.state_init,
    ),
    # ancestral variant: Euler move to sigma_down + fresh noise sigma_up
    # (the community-default stochastic sampler)
    "euler-a": SamplerDef(
        _euler.make_schedule,
        _euler.euler_ancestral_step,
        _euler.add_noise,
        scale_model_input=_euler.scale_model_input,
        stochastic=True,
    ),
    # Karras rho-7 sigma spacing (fractional timesteps via log-sigma
    # interpolation) — the standard quality-per-step option at <= 25 steps.
    "euler-karras": SamplerDef(
        functools.partial(_euler.make_schedule, karras=True),
        _euler.euler_step,
        _euler.add_noise,
        scale_model_input=_euler.scale_model_input,
    ),
    "dpm++-karras": SamplerDef(
        functools.partial(_dpm.make_schedule, karras=True),
        _dpm.dpm_step,
        _dpm.add_noise,
        multistep=True,
        state_init=_dpm.state_init,
    ),
    # SDE variant (diffusers "sde-dpmsolver++", midpoint — the community
    # "DPM++ 2M SDE"): same midpoint correction, reverse-SDE integration
    # with fresh per-step noise.
    "dpm++-sde": SamplerDef(
        functools.partial(_dpm.make_schedule, sde=True),
        _dpm.dpm_step,
        _dpm.add_noise,
        multistep=True,
        state_init=_dpm.state_init,
        stochastic=True,
    ),
    "dpm++-sde-karras": SamplerDef(
        functools.partial(_dpm.make_schedule, karras=True, sde=True),
        _dpm.dpm_step,
        _dpm.add_noise,
        multistep=True,
        state_init=_dpm.state_init,
        stochastic=True,
    ),
    # UniPC (order-2 bh2): predictor-corrector multistep ODE solver —
    # matches diffusers' UniPCMultistepScheduler defaults.
    "unipc": SamplerDef(
        _unipc.make_schedule,
        _unipc.unipc_step,
        _unipc.add_noise,
        multistep=True,
        state_init=_unipc.state_init,
    ),
    "unipc-karras": SamplerDef(
        functools.partial(_unipc.make_schedule, karras=True),
        _unipc.unipc_step,
        _unipc.add_noise,
        multistep=True,
        state_init=_unipc.state_init,
    ),
    "euler-a-karras": SamplerDef(
        functools.partial(_euler.make_schedule, karras=True),
        _euler.euler_ancestral_step,
        _euler.add_noise,
        scale_model_input=_euler.scale_model_input,
        stochastic=True,
    ),
}


def slice_schedule(
    schedule,
    *,
    num_train_timesteps: int,
    denoising_end: Optional[float] = None,
    denoising_start: Optional[float] = None,
):
    """Split a schedule at a denoising fraction — the SDXL base->refiner
    handoff (diffusers ``denoising_end``/``denoising_start`` semantics:
    the cutoff is ``round(N - frac * N)`` in TRAINING timesteps; the base
    keeps steps with t >= cutoff, the refiner keeps t < cutoff, so the two
    halves partition the full schedule exactly).

    Works on any sampler's schedule: every (S,) per-step field is sliced,
    (S+1,) fields (Euler's sigma ladder) keep the boundary entry.  A
    start-slice zeroes DPM++'s first ``inv_2r`` so the multistep solver
    cold-starts first-order (there is no previous x0 across the handoff).
    """
    import numpy as np

    ts = np.asarray(schedule.timesteps)
    S = int(ts.shape[0])
    if (denoising_end is None) == (denoising_start is None):
        raise ValueError("pass exactly one of denoising_end/denoising_start")
    frac = denoising_end if denoising_end is not None else denoising_start
    if not 0.0 < frac < 1.0:
        raise ValueError("denoising fraction must be in (0, 1)")
    cutoff = round(num_train_timesteps - frac * num_train_timesteps)
    if denoising_end is not None:
        k = int((ts >= cutoff).sum())  # keep the high-noise head
        if not 0 < k <= S:
            raise ValueError(
                f"denoising_end={frac} leaves no steps to run"
            )
        sl, sl1 = slice(0, k), slice(0, k + 1)
    else:
        k = int((ts < cutoff).sum())  # keep the low-noise tail
        if not 0 < k <= S:
            raise ValueError(
                f"denoising_start={frac} leaves no steps to run"
            )
        sl, sl1 = slice(S - k, S), slice(S - k, S + 1)
    upd = {}
    for f in dataclasses.fields(schedule):
        v = getattr(schedule, f.name)
        n = getattr(v, "shape", None)
        if n and len(n) >= 1:
            if n[0] == S:
                upd[f.name] = v[sl]
            elif n[0] == S + 1:
                upd[f.name] = v[sl1]
    out = dataclasses.replace(schedule, **upd)
    if denoising_start is not None and hasattr(out, "inv_2r"):
        out = dataclasses.replace(out, inv_2r=out.inv_2r.at[0].set(0.0))
    if denoising_start is not None and hasattr(out, "corr_on"):
        # UniPC cold start: no x0 history or last_sample crosses the
        # handoff — first step runs predictor-only at order 1.
        out = dataclasses.replace(
            out,
            corr_on=out.corr_on.at[0].set(0.0),
            pd=out.pd.at[0].set(0.0),
        )
        if out.num_steps >= 2:
            # step 1's corrector would reference the pre-handoff m_prev2
            # (zeros) through cc3; demote it to the order-1 corrector.
            lam = np.log(
                np.asarray(out.sqrt_alpha_prod, np.float64)
                / np.asarray(out.sqrt_one_minus_alpha_prod, np.float64)
            )
            hh = -(lam[1] - lam[0])
            phi1 = np.expm1(hh)
            a1 = float(np.asarray(out.sqrt_alpha_prod)[1])
            out = dataclasses.replace(
                out,
                cc3=out.cc3.at[1].set(0.0),
                cc4=out.cc4.at[1].set(-a1 * float(phi1) * 0.5),
            )
    return out


def get_sampler(name: str) -> SamplerDef:
    try:
        return SAMPLERS[name]
    except KeyError:
        raise ValueError(f"unknown sampler {name!r}; available: {sorted(SAMPLERS)}") from None


__all__ = [
    "DDPMSchedule",
    "SAMPLERS",
    "SamplerDef",
    "add_noise",
    "ddpm_step",
    "get_sampler",
    "inference_timesteps",
    "make_alphas_cumprod",
    "make_betas",
    "make_schedule",
    "slice_schedule",
]
