"""int8 activation calibration (``sdtpu/utils/calibrate.py``): the eager
capture hook, calibrated static scales for the un-normalized matmuls, and
the pipeline-level calibrate -> quantize -> generate flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import UNetConfig
from sdtpu.models.unet import init_unet, unet_forward
from sdtpu.ops.linear import activation_capture, linear, linear_q8
from sdtpu.utils.calibrate import (
    calibrate_pipeline_act_ranges,
    calibrate_unet_act_ranges,
    collect_unet_samples,
    iter_dynamic_sites,
)
from sdtpu.utils.quant import _quantize_linear, quantize_unet_int8

from test_pipeline import TINY, TOKENS

CFG = UNetConfig(
    block_out_channels=(64, 96),
    layers_per_block=1,
    attention_levels=(True, True),
    num_attention_heads=2,
    cross_attention_dim=64,
    norm_num_groups=8,
)


def _samples(cfg, n=2, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        lat = jnp.asarray(
            rng.standard_normal((1, 8, 8, cfg.in_channels)), jnp.float32
        )
        ctx = jnp.asarray(
            rng.standard_normal((1, 5, cfg.cross_attention_dim)), jnp.float32
        )
        yield lat, jnp.asarray([500.0 - 100.0 * i]), ctx


class TestCapture:
    def test_eager_capture_covers_every_dynamic_site(self):
        params = init_unet(0, CFG)
        ranges = calibrate_unet_act_ranges(params, CFG, _samples(CFG))
        sites = dict(iter_dynamic_sites(params))
        assert set(ranges) == set(sites)
        for path, amax in ranges.items():
            assert amax.shape == (sites[path]["kernel"].shape[0],)
            assert (amax > 0).all()

    def test_capture_accumulates_max_over_samples(self):
        lin = {"kernel": jnp.ones((4, 4))}
        store = {}
        with activation_capture(store, {id(lin["kernel"]): "site"}):
            linear(jnp.asarray([[1.0, -2.0, 0.5, 0.0]]), lin)
            linear(jnp.asarray([[0.5, 1.0, -3.0, 0.1]]), lin)
        np.testing.assert_allclose(store["site"], [1.0, 2.0, 3.0, 0.1])

    def test_capture_under_jit_raises(self):
        lin = {"kernel": jnp.ones((4, 4))}
        with activation_capture({}, {id(lin["kernel"]): "site"}):
            with pytest.raises(RuntimeError, match="eagerly"):
                jax.jit(lambda x: linear(x, lin))(jnp.ones((1, 4)))

    def test_no_capture_outside_context(self):
        lin = {"kernel": jnp.ones((4, 4))}
        store = {}
        with activation_capture(store, {id(lin["kernel"]): "site"}):
            pass
        linear(jnp.ones((1, 4)), lin)
        assert store == {}


class TestCalibratedStaticQuant:
    def test_static_scales_track_float_within_8bit_budget(self, rng):
        """Calibrated static per-feature scales: in-range inputs contract
        within the usual int8 budget of the float matmul."""
        kernel = jnp.asarray(rng.standard_normal((64, 48)) * 0.05)
        lin = {"kernel": kernel, "bias": jnp.zeros(48)}
        x = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
        amax = np.asarray(jnp.max(jnp.abs(x), axis=0))
        s = np.maximum(amax / 127.0, 1e-8).astype(np.float32)
        qlin = _quantize_linear(lin, s, np.zeros_like(s))
        np.testing.assert_array_equal(np.asarray(qlin["zp_corr"]), 0.0)
        want = np.asarray(linear(x, lin))
        got = np.asarray(linear_q8(x, qlin))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.035, rel

    def test_quantizer_uses_ranges_and_respects_skips(self):
        params = init_unet(1, CFG)
        ranges = calibrate_unet_act_ranges(params, CFG, _samples(CFG))
        q = quantize_unet_int8(
            params, min_ch=8, transformer="full", act_ranges=ranges,
            skip_down=(0,),
        )
        # a calibrated site carries STATIC scales (act_scale, zero zp_corr)
        site = q["up_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["out"]
        assert "act_scale" in site and "kernel_q" in site
        np.testing.assert_array_equal(np.asarray(site["zp_corr"]), 0.0)
        # skipped block stays float
        skipped = q["down_blocks"][0]["attentions"][0]["blocks"][0]
        assert "kernel" in skipped["attn1"]["out"]

    def test_uncalibrated_sites_fall_back_to_dynamic(self):
        params = init_unet(2, CFG)
        ranges = calibrate_unet_act_ranges(params, CFG, _samples(CFG))
        key = "up_blocks.0.attentions.0.blocks.0.ff.out"
        partial = {k: v for k, v in ranges.items() if k != key}
        q = quantize_unet_int8(
            params, min_ch=8, transformer="full", act_ranges=partial
        )
        site = q["up_blocks"][0]["attentions"][0]["blocks"][0]["ff"]["out"]
        assert "kernel_q" in site and "act_scale" not in site  # dynamic

    def test_calibrated_forward_close_to_float(self, rng):
        params = init_unet(3, CFG)
        ranges = calibrate_unet_act_ranges(params, CFG, _samples(CFG))
        q = quantize_unet_int8(
            params, min_ch=8, transformer="full", act_ranges=ranges
        )
        lat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, 5, 64)), jnp.float32)
        ts = jnp.asarray([300.0])
        want = np.asarray(unet_forward(lat, ts, ctx, params, CFG))
        got = np.asarray(unet_forward(lat, ts, ctx, q, CFG))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.06, rel


class TestPipelineCalibration:
    def test_calibrate_then_generate(self, rng):
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        ranges = calibrate_pipeline_act_ranges(
            pipe, TOKENS, num_steps=2, seed=1
        )
        assert ranges  # every attention level has dynamic sites
        base = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3,
            output="float",
        )
        pipe.quantize_int8(min_ch=8, transformer="full", act_ranges=ranges)
        img = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3,
            output="float",
        )
        assert img.shape == base.shape
        assert np.isfinite(img).all()

    def test_trajectory_sampler_yields_expected_count(self):
        from test_pipeline import TINY as T

        params = init_unet(0, CFG)
        rng = np.random.default_rng(0)
        ctx = jnp.asarray(rng.standard_normal((1, 5, 64)), jnp.float32)
        out = list(collect_unet_samples(
            params, CFG, T.scheduler, context=ctx, latent_size=8,
            num_steps=3,
        ))
        assert len(out) == 3
        ts = [float(t[0]) for _, t, _ in out]
        assert ts == sorted(ts, reverse=True)  # descending noise levels
