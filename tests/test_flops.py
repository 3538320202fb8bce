"""Analytic FLOP accounting sanity (sdtpu/utils/flops.py) — the basis of
bench.py's MFU number (XLA cost_analysis counts scan bodies once)."""

from sdtpu.config import get_preset
from sdtpu.utils.flops import (
    pipeline_flops,
    unet_step_flops,
    vae_decode_flops,
    vae_encode_flops,
)


class TestUNetFlops:
    def test_tiny_sd_magnitude(self):
        """One CFG-batched Tiny-SD step at 64x64 latents is ~1 TFLOP
        (323M-param UNet, 4096 tokens) — order-of-magnitude anchor."""
        f = unet_step_flops(get_preset("tiny-sd").unet, 64, 2)
        assert 0.5e12 < f < 2e12

    def test_sd15_more_than_tiny(self):
        tiny = unet_step_flops(get_preset("tiny-sd").unet, 64, 2)
        sd15 = unet_step_flops(get_preset("sd15").unet, 64, 2)
        assert sd15 > 1.3 * tiny

    def test_scales_with_batch_and_resolution(self):
        cfg = get_preset("tiny-sd").unet
        assert unet_step_flops(cfg, 64, 4) == 2 * unet_step_flops(cfg, 64, 2)
        assert unet_step_flops(cfg, 128, 2) > 3 * unet_step_flops(cfg, 64, 2)


class TestPipelineFlops:
    def test_steps_dominate(self):
        cfg = get_preset("tiny-sd")
        f25 = pipeline_flops(cfg, 512, 25, 1)
        f50 = pipeline_flops(cfg, 512, 50, 1)
        assert f50 > 1.8 * f25

    def test_img2img_truncates_steps_and_adds_encoder(self):
        cfg = get_preset("tiny-sd")
        txt = pipeline_flops(cfg, 512, 25, 1)
        i2i_full = pipeline_flops(cfg, 512, 25, 1, img2img=True, strength=1.0)
        i2i_half = pipeline_flops(cfg, 512, 25, 1, img2img=True, strength=0.5)
        enc = vae_encode_flops(cfg.vae, 512, 1)
        assert abs(i2i_full - (txt + enc)) / txt < 1e-9
        # strength 0.5 runs ~13 of 25 steps
        assert i2i_half < 0.65 * i2i_full

    def test_no_cfg_halves_unet(self):
        cfg = get_preset("tiny-sd")
        with_cfg = pipeline_flops(cfg, 512, 25, 1, cfg=True)
        without = pipeline_flops(cfg, 512, 25, 1, cfg=False)
        assert without < 0.6 * with_cfg

    def test_sdxl_includes_second_encoder(self):
        cfg = get_preset("sdxl")
        f = pipeline_flops(cfg, 1024, 25, 1)
        assert f > pipeline_flops(get_preset("tiny-sd"), 512, 25, 1) * 5

    def test_vae_decode_magnitude(self):
        # SD VAE decode at 64x64 latents -> 512px is ~1-3 TFLOP
        f = vae_decode_flops(get_preset("tiny-sd").vae, 64, 1)
        assert 0.5e12 < f < 5e12
