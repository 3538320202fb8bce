"""DDIM / Euler sampler tests + sampler-generic pipeline runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import SchedulerConfig
from sdtpu.samplers import get_sampler
from sdtpu.samplers import ddim, euler

from conftest import assert_allclose

CFG = SchedulerConfig()


class TestDDIM:
    def test_deterministic(self):
        sched = ddim.make_schedule(CFG, 10)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        e = jax.random.normal(jax.random.key(1), x.shape)
        a = ddim.ddim_step(sched, jnp.array(3), x, e, jnp.zeros_like(x))
        b = ddim.ddim_step(sched, jnp.array(3), x, e, jnp.ones_like(x))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_oracle_chain_recovers_x0(self):
        """With oracle eps each step, DDIM lands exactly on x0."""
        sched = ddim.make_schedule(CFG, 25)
        x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        z = jax.random.normal(jax.random.key(1), x0.shape)
        x = ddim.add_noise(sched, x0, z, 0)
        for i in range(sched.num_steps):
            sa = sched.sqrt_alpha_prod[i]
            sb = sched.sqrt_one_minus_alpha_prod[i]
            e = (x - sa * x0) / sb
            x = ddim.ddim_step(sched, jnp.array(i), x, e, jnp.zeros_like(x))
        assert_allclose(x, x0, atol=1e-3, rtol=1e-2)

    def test_last_step_is_x0_hat(self):
        sched = ddim.make_schedule(CFG, 25)
        i = sched.num_steps - 1
        assert float(sched.timesteps[i]) == 0.0
        # a_prev = 1 at the last step: x_prev == x0_hat exactly
        assert_allclose(sched.sqrt_alpha_prod_prev[i], 1.0, rtol=1e-6)
        assert_allclose(sched.sqrt_one_minus_alpha_prod_prev[i], 0.0, atol=1e-7)


class TestEuler:
    def test_sigma_relationship(self):
        sched = euler.make_schedule(CFG, 10)
        # sigma = sqrt((1-a)/a) consistent with exposed sqrt_alpha_prod
        sa = np.asarray(sched.sqrt_alpha_prod)
        sig = np.asarray(sched.sigmas[:-1])
        assert_allclose(sa, 1 / np.sqrt(sig**2 + 1), rtol=1e-5)
        assert sched.init_sigma == pytest.approx(float(sched.sigmas[0]))
        assert float(sched.sigmas[-1]) == 0.0

    def test_one_step_turbo_like(self):
        """Single-step euler from pure noise: x1 = x - sigma_max * eps -> with
        oracle eps = (x - x0)/sigma it returns exactly x0."""
        sched = euler.make_schedule(CFG, 1)
        x0 = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
        z = jax.random.normal(jax.random.key(1), x0.shape)
        x = x0 + sched.init_sigma * z  # add_noise at step 0
        e = (x - x0) / sched.sigmas[0]
        out = euler.euler_step(sched, jnp.array(0), x, e, jnp.zeros_like(x))
        assert_allclose(out, x0, atol=1e-4, rtol=1e-3)

    def test_scale_model_input(self):
        sched = euler.make_schedule(CFG, 5)
        x = jnp.ones((1, 2, 2, 4))
        scaled = euler.scale_model_input(sched, jnp.array(0), x)
        expected = 1.0 / np.sqrt(float(sched.sigmas[0]) ** 2 + 1.0)
        assert_allclose(scaled, expected * np.ones_like(np.asarray(x)), rtol=1e-5)


class TestPipelineSamplers:
    @pytest.mark.parametrize("sampler", ["ddim", "euler", "euler-a"])
    def test_generate_with_sampler(self, sampler):
        from test_pipeline import TINY, TOKENS
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        img = pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=2, seed=1, sampler=sampler
        )
        assert img.shape == (1, 32, 32, 3)

    def test_unknown_sampler_raises(self):
        with pytest.raises(ValueError, match="unknown sampler"):
            get_sampler("plms")


class TestEulerAncestral:
    def test_sigma_split_identity_and_noise_injection(self):
        """sigma_up^2 + sigma_down^2 = sigma_next^2, and the zero-noise step
        is exactly the Euler move shortened to sigma_down."""
        sched = euler.make_schedule(CFG, 10)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        e = jax.random.normal(jax.random.key(1), x.shape)
        z = jax.random.normal(jax.random.key(2), x.shape)
        i = 4
        sigma = float(sched.sigmas[i])
        sigma_next = float(sched.sigmas[i + 1])
        up2 = sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2
        sigma_up = np.sqrt(up2)
        sigma_down = np.sqrt(sigma_next**2 - up2)
        assert sigma_up**2 + sigma_down**2 == pytest.approx(sigma_next**2)

        zero = euler.euler_ancestral_step(
            sched, jnp.array(i), x, e, jnp.zeros_like(x))
        expected = np.asarray(x) + (sigma_down - sigma) * np.asarray(e)
        assert_allclose(zero, expected, rtol=1e-4, atol=1e-5)

        noisy = euler.euler_ancestral_step(sched, jnp.array(i), x, e, z)
        assert_allclose(
            np.asarray(noisy) - np.asarray(zero),
            sigma_up * np.asarray(z), rtol=1e-4, atol=1e-5)

    def test_final_step_lands_on_x0(self):
        """sigma_next = 0 at the last step: sigma_up = sigma_down = 0 and the
        update returns x0 exactly, noise ignored."""
        sched = euler.make_schedule(CFG, 10)
        x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        i = sched.num_steps - 1
        sigma = float(sched.sigmas[i])
        z = jax.random.normal(jax.random.key(1), x0.shape)
        x = x0 + sigma * z
        e = z  # oracle eps
        out = euler.euler_ancestral_step(
            sched, jnp.array(i), x, e,
            jax.random.normal(jax.random.key(2), x0.shape))
        assert_allclose(out, x0, rtol=1e-3, atol=1e-4)


class TestKarras:
    def test_sigma_grid_properties(self):
        """rho-7 interpolation: descending, endpoints equal the window's
        sigma_max/min, interior points match the closed form; fractional
        timesteps invert the training log-sigma curve."""
        from sdtpu.samplers.ddpm import (
            inference_timesteps,
            karras_sigma_grid,
            make_alphas_cumprod,
        )

        cfg = SchedulerConfig()
        n = 8
        sig, ts = karras_sigma_grid(cfg, n)
        assert sig.shape == ts.shape == (n,)
        assert (np.diff(sig) < 0).all() and (np.diff(ts) < 0).all()
        ac = make_alphas_cumprod(cfg)
        full = np.sqrt((1.0 - ac) / ac)
        base_ts = inference_timesteps(cfg, n)
        np.testing.assert_allclose(sig[0], full[base_ts[0]], rtol=1e-9)
        np.testing.assert_allclose(sig[-1], full[base_ts[-1]], rtol=1e-9)
        # closed form at the midpoint of the ramp (i = n//2 ... exact index)
        rho, i = 7.0, 3
        r = i / (n - 1)
        want = (
            sig[0] ** (1 / rho) + r * (sig[-1] ** (1 / rho) - sig[0] ** (1 / rho))
        ) ** rho
        np.testing.assert_allclose(sig[i], want, rtol=1e-9)
        # timesteps invert the training curve (approximately: the forward
        # map interpolates in LOG sigma, this check in linear sigma)
        np.testing.assert_allclose(
            np.interp(ts, np.arange(len(full)), full), sig, rtol=1e-3
        )

    def test_euler_karras_schedule_concentrates_low_noise(self):
        """Karras spacing puts MORE of the grid at low sigma than the
        uniform spacing (the whole point)."""
        cfg = SchedulerConfig()
        plain = euler.make_schedule(cfg, 10)
        karr = euler.make_schedule(cfg, 10, karras=True)
        assert float(karr.sigmas[5]) < float(plain.sigmas[5])
        assert karr.timesteps.dtype == jnp.float32  # fractional

    @pytest.mark.parametrize(
        "sampler", ["euler-karras", "dpm++-karras", "euler-a-karras"])
    def test_generate_with_karras_sampler(self, sampler):
        from test_pipeline import TINY, TOKENS
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        img = pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=3, seed=1,
            sampler=sampler,
        )
        assert img.shape == (1, 32, 32, 3)
        base = pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=3, seed=1,
            sampler=sampler.replace("-karras", ""),
        )
        assert (img != base).any()  # different sigma grid, different image


class TestVPrediction:
    def test_ddpm_v_prediction_recovers_x0(self):
        """Oracle v each step: v = sqrt(a) eps - sqrt(1-a) x0 (so that
        x0_hat = sqrt(a) x - sqrt(1-a) v exactly)."""
        import dataclasses
        from sdtpu.samplers.ddpm import add_noise as ddpm_add_noise
        from sdtpu.samplers.ddpm import ddpm_step, make_schedule

        cfg = dataclasses.replace(CFG, prediction_type="v_prediction")
        sched = make_schedule(cfg, 25)
        assert sched.prediction_type == "v_prediction"
        x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        z = jax.random.normal(jax.random.key(1), x0.shape)
        x = ddpm_add_noise(sched, x0, z, 0)
        for i in range(sched.num_steps):
            sa = sched.sqrt_alpha_prod[i]
            sb = sched.sqrt_one_minus_alpha_prod[i]
            eps = (x - sa * x0) / sb
            v = sa * eps - sb * x0
            x = ddpm_step(sched, jnp.array(i), x, v, jnp.zeros_like(x))
        assert_allclose(x, x0, atol=1e-2, rtol=1e-2)

    def test_euler_v_prediction_matches_epsilon_run(self):
        """Euler with an exact v-oracle must take the same step as with the
        matching eps-oracle (both recover the same x0 -> same derivative).
        Guards the SD 2.1 (v_prediction) + sampler='euler' path, which
        previously treated v as epsilon silently."""
        import dataclasses

        sched_e = euler.make_schedule(CFG, 10)
        sched_v = euler.make_schedule(
            dataclasses.replace(CFG, prediction_type="v_prediction"), 10
        )
        assert sched_v.prediction_type == "v_prediction"
        x0 = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.key(1), x0.shape)
        i = jnp.array(3)
        sigma = sched_e.sigmas[3]
        x = x0 + sigma * eps  # UNSCALED sigma-space sample
        # v corresponds to the SCALED model input x/sqrt(sigma^2+1):
        # v = eps/sqrt(1+s^2) - s*x0/sqrt(1+s^2)
        r = jnp.sqrt(1.0 + sigma**2)
        v = eps / r - sigma * x0 / r
        z = jnp.zeros_like(x)
        a = euler.euler_step(sched_e, i, x, eps, z)
        b = euler.euler_step(sched_v, i, x, v, z)
        assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_euler_v_prediction_one_exact_step_recovers_x0(self):
        """With an exact v-oracle, stepping to sigma=0 lands on x0."""
        import dataclasses

        sched = euler.make_schedule(
            dataclasses.replace(CFG, prediction_type="v_prediction"), 1
        )
        x0 = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.key(1), x0.shape)
        sigma = sched.sigmas[0]
        x = x0 + sigma * eps
        r = jnp.sqrt(1.0 + sigma**2)
        v = eps / r - sigma * x0 / r
        out = euler.euler_step(sched, jnp.array(0), x, v, jnp.zeros_like(x))
        assert_allclose(out, x0, atol=1e-3, rtol=1e-3)

    def test_ddim_v_prediction_matches_epsilon_run(self):
        """The same trajectory expressed in eps- and v-parameterization must
        produce identical DDIM updates."""
        import dataclasses

        sched_e = ddim.make_schedule(CFG, 10)
        sched_v = ddim.make_schedule(
            dataclasses.replace(CFG, prediction_type="v_prediction"), 10
        )
        x = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.key(1), x.shape)
        i = jnp.array(3)
        sa = sched_e.sqrt_alpha_prod[3]
        sb = sched_e.sqrt_one_minus_alpha_prod[3]
        v = sa * eps - sb * ((x - sb * eps) / sa)  # v for this (x, eps)
        a = ddim.ddim_step(sched_e, i, x, eps, jnp.zeros_like(x))
        b = ddim.ddim_step(sched_v, i, x, v, jnp.zeros_like(x))
        assert_allclose(a, b, atol=1e-4, rtol=1e-4)


class TestLCM:
    def test_schedule_shapes(self):
        from sdtpu.samplers import lcm

        sched = lcm.make_schedule(CFG, 4)
        assert sched.num_steps == 4
        ts = np.asarray(sched.timesteps)
        assert (np.diff(ts) < 0).all()  # descending
        assert float(sched.noise_mask[-1]) == 0.0
        assert (np.asarray(sched.noise_mask[:-1]) == 1.0).all()

    def test_single_step_returns_denoised(self):
        from sdtpu.samplers import lcm

        sched = lcm.make_schedule(CFG, 1)
        x = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
        e = jax.random.normal(jax.random.key(1), x.shape)
        z = jax.random.normal(jax.random.key(2), x.shape)
        out_a = lcm.lcm_step(sched, jnp.array(0), x, e, z)
        out_b = lcm.lcm_step(sched, jnp.array(0), x, e, jnp.zeros_like(z))
        # final step: no noise injected regardless of z
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    def test_boundary_conditions(self):
        """c_skip + scaling consistency: c_skip->1, c_out->0 as t->0."""
        from sdtpu.samplers.lcm import SIGMA_DATA, TIMESTEP_SCALING

        for t in (0.0, 999.0):
            s = t * TIMESTEP_SCALING
            c_skip = SIGMA_DATA**2 / (s**2 + SIGMA_DATA**2)
            c_out = s / np.sqrt(s**2 + SIGMA_DATA**2)
            assert_allclose(c_skip**0.5 * 0 + c_skip + c_out**2, c_skip + c_out**2)
        s0 = 0 * TIMESTEP_SCALING
        assert SIGMA_DATA**2 / (s0**2 + SIGMA_DATA**2) == 1.0

    def test_pipeline_lcm_with_guidance_embedding(self):
        """LCM UNet (time_cond_proj_dim) + lcm sampler, 4 steps, no CFG."""
        import dataclasses

        from test_pipeline import TINY, TOKENS
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        cfg = TINY.replace(
            unet=dataclasses.replace(TINY.unet, time_cond_proj_dim=32)
        )
        pipe = StableDiffusionPipeline.from_random(cfg, seed=0)
        img = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=4, seed=0,
            cfg=False, cfg_scale=8.0, sampler="lcm",
        )
        assert img.shape == (1, 32, 32, 3)


class TestVPredictionPipeline:
    def test_generate_with_v_prediction_config(self):
        """SD 2.x-style pipeline (v-prediction scheduler) end-to-end."""
        import dataclasses

        from test_pipeline import TINY, TOKENS
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        cfg = TINY.replace(
            scheduler=dataclasses.replace(
                TINY.scheduler, prediction_type="v_prediction"
            )
        )
        pipe = StableDiffusionPipeline.from_random(cfg, seed=0)
        for sampler in ("ddpm", "ddim"):
            img = pipe.generate("x", token_ids=TOKENS, num_inference_steps=2,
                                seed=0, sampler=sampler)
            assert img.shape == (1, 32, 32, 3)


class TestDPMSolverPP:
    def test_final_step_returns_x0(self):
        """c1[last] == 0, c2[last] == alpha_next == 1: last update = D."""
        from sdtpu.samplers import dpm

        sched = dpm.make_schedule(CFG, 20)
        assert float(sched.c1[-1]) == 0.0
        assert abs(float(sched.c2[-1]) - 1.0) < 1e-6
        assert float(sched.inv_2r[0]) == 0.0
        assert np.isfinite(np.asarray(sched.c2)).all()

    def test_oracle_chain_recovers_x0(self):
        """With oracle eps at each step the ODE solver lands on x0."""
        from sdtpu.samplers import dpm

        sched = dpm.make_schedule(CFG, 20)
        x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        z = jax.random.normal(jax.random.key(1), x0.shape)
        x = dpm.add_noise(sched, x0, z, 0)
        state = dpm.state_init(x)
        for i in range(sched.num_steps):
            sa = sched.sqrt_alpha_prod[i]
            sb = sched.sqrt_one_minus_alpha_prod[i]
            e = (x - sa * x0) / sb
            x, state = dpm.dpm_step(sched, jnp.array(i), x, e, jnp.zeros_like(x), state)
        assert_allclose(x, x0, atol=1e-2, rtol=1e-2)

    def test_deterministic(self):
        from sdtpu.samplers import dpm

        sched = dpm.make_schedule(CFG, 10)
        x = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
        e = jax.random.normal(jax.random.key(1), x.shape)
        s = dpm.state_init(x)
        a, _ = dpm.dpm_step(sched, jnp.array(2), x, e, jnp.zeros_like(x), s)
        b, _ = dpm.dpm_step(sched, jnp.array(2), x, e, jnp.ones_like(x), s)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pipeline_dpm(self):
        from test_pipeline import TINY, TOKENS
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        img = pipe.generate("x", token_ids=TOKENS, num_inference_steps=4,
                            seed=0, sampler="dpm++")
        assert img.shape == (1, 32, 32, 3)

    def test_second_order_differs_from_first(self):
        """The multistep correction must actually engage after step 0."""
        from sdtpu.samplers import dpm

        sched = dpm.make_schedule(CFG, 10)
        x = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
        e = jax.random.normal(jax.random.key(1), x.shape)
        zero_state = dpm.state_init(x)
        other_state = jnp.ones_like(x)
        a, _ = dpm.dpm_step(sched, jnp.array(3), x, e, jnp.zeros_like(x), zero_state)
        b, _ = dpm.dpm_step(sched, jnp.array(3), x, e, jnp.zeros_like(x), other_state)
        assert (np.asarray(a) != np.asarray(b)).any()


class TestTimestepSpacing:
    """Spacing grids (diffusers semantics) + zero terminal SNR (Lin et al.
    2023: trailing spacing, rescaled betas, guidance_rescale)."""

    def test_trailing_endpoints(self):
        from sdtpu.samplers.ddpm import inference_timesteps

        cfg = SchedulerConfig(timestep_spacing="trailing")
        ts = inference_timesteps(cfg, 25)
        assert ts[0] == 999 and ts[-1] == 39  # arange(1000,0,-40)-1
        assert len(ts) == 25 and (np.diff(ts) < 0).all()

    def test_linspace_endpoints(self):
        from sdtpu.samplers.ddpm import inference_timesteps

        cfg = SchedulerConfig(timestep_spacing="linspace")
        ts = inference_timesteps(cfg, 25)
        assert ts[0] == 999 and ts[-1] == 0
        assert len(ts) == 25 and (np.diff(ts) < 0).all()

    def test_leading_unchanged(self):
        from sdtpu.samplers.ddpm import inference_timesteps

        ts_default = inference_timesteps(SchedulerConfig(), 25)
        ts_leading = inference_timesteps(
            SchedulerConfig(timestep_spacing="leading"), 25
        )
        np.testing.assert_array_equal(ts_default, ts_leading)
        assert ts_default[0] == 960 and ts_default[-1] == 0

    def test_unknown_spacing_raises(self):
        from sdtpu.samplers.ddpm import inference_timesteps

        with pytest.raises(ValueError, match="timestep_spacing"):
            inference_timesteps(SchedulerConfig(timestep_spacing="x"), 25)

    def test_trailing_strength_truncation(self):
        from sdtpu.samplers.ddpm import inference_timesteps

        cfg = SchedulerConfig(timestep_spacing="trailing")
        full = inference_timesteps(cfg, 20)
        part = inference_timesteps(cfg, 20, strength=0.5)
        np.testing.assert_array_equal(part, full[10:])


class TestZeroTerminalSNR:
    def test_rescale_zeroes_terminal_and_preserves_first(self):
        from sdtpu.samplers.ddpm import (
            make_alphas_cumprod,
            make_betas,
            rescale_zero_terminal_snr,
        )

        base = SchedulerConfig()
        betas = make_betas(base)
        res = rescale_zero_terminal_snr(betas)
        ac = np.cumprod(1.0 - res)
        assert abs(ac[-1]) < 1e-12  # terminal SNR exactly 0
        np.testing.assert_allclose(
            ac[0], make_alphas_cumprod(base)[0], rtol=1e-12
        )
        assert (res > 0).all() and (res <= 1.0).all()
        assert (np.diff(ac) < 0).all()  # still monotonically decaying

    def test_config_flag_applies(self):
        from sdtpu.samplers.ddpm import make_alphas_cumprod

        ac = make_alphas_cumprod(
            SchedulerConfig(rescale_betas_zero_snr=True)
        )
        assert abs(ac[-1]) < 1e-12

    def test_ve_sigmas_finite_at_zero_snr(self):
        from sdtpu.samplers.ddpm import make_alphas_cumprod, ve_sigmas

        ac = make_alphas_cumprod(SchedulerConfig(rescale_betas_zero_snr=True))
        sig = ve_sigmas(ac)
        assert np.isfinite(sig).all()
        np.testing.assert_allclose(sig[-1], np.sqrt((1 - 2**-24) / 2**-24))

    ZSNR = SchedulerConfig(
        prediction_type="v_prediction",
        timestep_spacing="trailing",
        rescale_betas_zero_snr=True,
    )

    @pytest.mark.parametrize("name", ["ddim", "euler", "dpm++", "ddpm"])
    def test_samplers_finite_under_zero_snr(self, name):
        """v-pred samplers must produce finite steps at the terminal
        (SNR = 0) timestep that trailing spacing includes."""
        sdef = get_sampler(name)
        sched = sdef.make_schedule(self.ZSNR, 8)
        assert int(np.asarray(sched.timesteps[0])) == 999
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        v = jax.random.normal(jax.random.key(1), x.shape)
        state = sdef.state_init(x) if sdef.multistep else None
        for i in range(2):
            if sdef.scale_model_input is not None:
                _ = sdef.scale_model_input(sched, jnp.array(i), x)
            if sdef.multistep:
                x, state = sdef.step(sched, jnp.array(i), x, v, jnp.zeros_like(x), state)
            else:
                x = sdef.step(sched, jnp.array(i), x, v, jnp.zeros_like(x))
        assert np.isfinite(np.asarray(x)).all()

    def test_pipeline_runs_zsnr_v_prediction(self):
        from test_pipeline import TINY, TOKENS
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        cfg = TINY.replace(name="test/zsnr", scheduler=self.ZSNR)
        pipe = StableDiffusionPipeline.from_random(cfg, seed=0)
        img = pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=3, seed=1,
            sampler="ddim", guidance_rescale=0.7,
        )
        assert img.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(img, np.float32)).all()


class TestDPMppSDE:
    """DPM++ 2M SDE (diffusers "sde-dpmsolver++", midpoint)."""

    def test_coefficients_preserve_marginals(self):
        """For an exact x0, one SDE step must map the forward marginal at
        t onto the marginal at t_next: mean coeff c1*alpha_t + c2 ==
        alpha_next and variance c1^2*sigma_t^2 + c3^2 == sigma_next^2."""
        from sdtpu.samplers import dpm

        sched = dpm.make_schedule(CFG, 12, sde=True)
        a = np.asarray(sched.sqrt_alpha_prod, np.float64)
        s = np.asarray(sched.sqrt_one_minus_alpha_prod, np.float64)
        c1 = np.asarray(sched.c1, np.float64)
        c2 = np.asarray(sched.c2, np.float64)
        c3 = np.asarray(sched.c3, np.float64)
        a_next = np.concatenate([a[1:], [1.0]])
        s_next = np.concatenate([s[1:], [0.0]])
        np.testing.assert_allclose(c1 * a + c2, a_next, rtol=1e-5)
        np.testing.assert_allclose(
            c1**2 * s**2 + c3**2, s_next**2, rtol=1e-5, atol=1e-7
        )

    def test_ode_variant_has_zero_noise_coeff(self):
        from sdtpu.samplers import dpm

        sched = dpm.make_schedule(CFG, 12)
        assert (np.asarray(sched.c3) == 0).all()

    def test_final_step_returns_x0(self):
        from sdtpu.samplers import dpm
        import jax.numpy as jnp

        sched = dpm.make_schedule(CFG, 8, sde=True)
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        x0_prev = jax.random.normal(jax.random.key(1), x.shape)
        i = sched.num_steps - 1
        sa = sched.sqrt_alpha_prod[i]
        sb = sched.sqrt_one_minus_alpha_prod[i]
        x0_true = jax.random.normal(jax.random.key(2), x.shape)
        eps = (x - sa * x0_true) / sb
        nxt, _ = dpm.dpm_step(sched, jnp.array(i), x, eps,
                              jax.random.normal(jax.random.key(3), x.shape),
                              x0_prev)
        # c1 = 0, c2 = 1, c3 = 0, inv_2r[last] = 0 -> exactly x0_hat
        assert_allclose(nxt, x0_true, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("sampler", ["dpm++-sde", "dpm++-sde-karras"])
    def test_pipeline_runs_and_noise_matters(self, sampler, tiny_pipe):
        from test_pipeline import TOKENS

        pipe = tiny_pipe
        a = pipe.generate("x", token_ids=TOKENS, num_inference_steps=3,
                          seed=9, sampler=sampler)
        b = pipe.generate("x", token_ids=TOKENS, num_inference_steps=3,
                          seed=9, sampler=sampler)
        c = pipe.generate("x", token_ids=TOKENS, num_inference_steps=3,
                          seed=10, sampler=sampler)
        np.testing.assert_array_equal(a, b)  # per-seed deterministic
        assert (a != c).any()
        assert np.isfinite(np.asarray(a, np.float32)).all()
