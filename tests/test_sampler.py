"""DDPM scheduler tests.

Pins the scaled-linear beta schedule, diffusers timestep spacing, posterior
coefficients, strength truncation, and noise behavior (sampler.mojo:5-124,
with the SURVEY.md §5.1 fixes: 1000 train steps, Gaussian noise, bounds).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import SchedulerConfig
from sdtpu.samplers import (
    add_noise,
    ddpm_step,
    inference_timesteps,
    make_alphas_cumprod,
    make_betas,
    make_schedule,
)

from conftest import assert_allclose

CFG = SchedulerConfig()


class TestSchedule:
    def test_betas_scaled_linear(self):
        betas = make_betas(CFG)
        assert betas.shape == (1000,)
        assert_allclose(betas[0], 0.00085, rtol=1e-12)
        assert_allclose(betas[-1], 0.012, rtol=1e-12)
        # scaled-linear: sqrt(betas) is affine
        d = np.diff(np.sqrt(betas))
        assert_allclose(d, d[0] * np.ones_like(d), rtol=1e-6)

    def test_alphas_cumprod_monotone(self):
        ac = make_alphas_cumprod(CFG)
        assert (np.diff(ac) < 0).all()
        assert 0 < ac[-1] < ac[0] < 1

    def test_timestep_spacing_25(self):
        ts = inference_timesteps(CFG, 25)
        expected = (np.arange(25)[::-1] * 40).astype(np.int64)
        np.testing.assert_array_equal(ts, expected)
        assert ts[0] == 960 and ts[-1] == 0

    def test_strength_truncation(self):
        """img2img strength 0.6 with 10 steps -> start at step 4
        (sampler.mojo:67-73 semantics, bounds-checked)."""
        full = inference_timesteps(CFG, 10)
        part = inference_timesteps(CFG, 10, strength=0.6)
        np.testing.assert_array_equal(part, full[4:])

    def test_strength_one_keeps_all(self):
        np.testing.assert_array_equal(
            inference_timesteps(CFG, 25, strength=1.0),
            inference_timesteps(CFG, 25),
        )

    def test_strength_tiny_keeps_last(self):
        ts = inference_timesteps(CFG, 10, strength=0.01)
        assert len(ts) == 1 and ts[0] == 0


class TestStep:
    def test_coefficients_match_posterior_formula(self):
        """Independent recomputation of the diffusers DDPM posterior."""
        sched = make_schedule(CFG, 25)
        ac = make_alphas_cumprod(CFG)
        ts = inference_timesteps(CFG, 25)
        for i in [0, 7, 24]:
            t = int(ts[i])
            prev_t = t - 40
            a_t = ac[t]
            a_prev = ac[prev_t] if prev_t >= 0 else 1.0
            cb = 1 - a_t / a_prev
            c0 = np.sqrt(a_prev) * cb / (1 - a_t)
            c1 = np.sqrt(a_t / a_prev) * (1 - a_prev) / (1 - a_t)
            assert_allclose(sched.coeff_x0[i], c0, rtol=1e-6)
            assert_allclose(sched.coeff_xt[i], c1, rtol=1e-6)

    def test_last_step_no_noise(self):
        """t == 0 adds no variance noise (sampler.mojo:101)."""
        sched = make_schedule(CFG, 25)
        assert float(sched.sigma[-1]) == 0.0
        assert (np.asarray(sched.sigma[:-1]) > 0).all()

    def test_step_recovers_x0_at_last_step(self):
        """At t=0 with a perfect eps prediction, step returns ~x0."""
        sched = make_schedule(CFG, 25)
        key = jax.random.key(0)
        x0 = jax.random.normal(key, (1, 8, 8, 4))
        noise = jax.random.normal(jax.random.key(1), x0.shape)
        i = sched.num_steps - 1  # t == 0
        xt = sched.sqrt_alpha_prod[i] * x0 + sched.sqrt_one_minus_alpha_prod[i] * noise
        out = ddpm_step(sched, jnp.array(i), xt, noise, jnp.zeros_like(x0))
        # at t=0: coeff_x0 == 1, coeff_xt == 0 exactly
        assert_allclose(sched.coeff_x0[i], 1.0, rtol=1e-5)
        assert_allclose(sched.coeff_xt[i], 0.0, atol=1e-7)
        assert_allclose(out, x0, atol=1e-3, rtol=1e-2)

    def test_add_noise_formula(self):
        sched = make_schedule(CFG, 25)
        x0 = jnp.ones((1, 4, 4, 4))
        z = jnp.full((1, 4, 4, 4), 0.5)
        out = add_noise(sched, x0, z, 0)
        expected = (
            sched.sqrt_alpha_prod[0] * 1.0
            + sched.sqrt_one_minus_alpha_prod[0] * 0.5
        )
        assert_allclose(out, float(expected) * np.ones_like(np.asarray(out)), rtol=1e-6)

    def test_full_chain_denoises_toward_x0(self):
        """Analytic sanity: with the oracle eps at each step, the chain's
        mean converges to x0 (variance noise off)."""
        sched = make_schedule(CFG, 25)
        x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        eps = jax.random.normal(jax.random.key(1), x0.shape)
        x = add_noise(sched, x0, eps, 0)
        for i in range(sched.num_steps):
            # oracle eps for the current x: eps_t = (x - sqrt(a) x0)/sqrt(1-a)
            sa = sched.sqrt_alpha_prod[i]
            sb = sched.sqrt_one_minus_alpha_prod[i]
            e = (x - sa * x0) / sb
            x = ddpm_step(sched, jnp.array(i), x, e, jnp.zeros_like(x))
        assert_allclose(x, x0, atol=1e-2, rtol=1e-2)
