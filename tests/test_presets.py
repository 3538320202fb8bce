"""Preset registry + preset-level runtime defaults (BASELINE config 5: the
few-step distilled presets must work out of the box — ``generate(prompt)``
with no sampler/step arguments runs the preset's native configuration)."""

import dataclasses

import numpy as np
import pytest

from sdtpu.config import get_preset
from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from sdtpu.pipeline.serving import ServingEngine

from test_pipeline import TINY

IDS = np.array([1, 5, 9, 2] + [0] * 12)


class TestDistilledPresets:
    def test_lcm_sd15_preset(self):
        cfg = get_preset("lcm-sd15")
        assert cfg.unet.time_cond_proj_dim == 256
        assert cfg.unet.block_out_channels == (320, 640, 1280, 1280)
        assert cfg.default_sampler == "lcm"
        assert cfg.default_cfg is False  # guidance via embedding, not CFG
        assert cfg.default_steps == 4

    def test_sdxl_turbo_preset(self):
        cfg = get_preset("sdxl-turbo")
        assert cfg.clip_2 is not None
        assert cfg.default_image_size == 512
        assert cfg.default_sampler == "euler"
        assert cfg.default_cfg is False
        assert cfg.default_steps == 4

    def test_all_presets_resolve(self):
        for name in ("tiny-sd", "sd15", "sd21", "sdxl", "lcm-sd15",
                     "sdxl-turbo", "sdxl-refiner", "sd15-inpaint",
                     "sdxl-inpaint", "ip2p"):
            assert get_preset(name).name

    def test_conditioned_input_presets(self):
        """in_channels routes the generate() wiring — pin the constants."""
        assert get_preset("sd15-inpaint").unet.in_channels == 9
        assert get_preset("sdxl-inpaint").unet.in_channels == 9
        assert get_preset("sdxl-inpaint").clip_2 is not None
        assert get_preset("ip2p").unet.in_channels == 8
        assert get_preset("sdxl-refiner").clip is None
        assert get_preset("sdxl-refiner").requires_aesthetics_score


# a tiny LCM-shaped config: guidance-embedding UNet + lcm defaults
TINY_LCM = TINY.replace(
    unet=dataclasses.replace(TINY.unet, time_cond_proj_dim=8),
    default_steps=2,
    default_sampler="lcm",
    default_cfg=False,
    default_cfg_scale=8.0,
)


@pytest.fixture(scope="module")
def lcm_pipe():
    return StableDiffusionPipeline.from_random(TINY_LCM, seed=0)


class TestPresetDefaults:
    def test_generate_uses_preset_defaults(self, lcm_pipe):
        """No sampler/steps/cfg args: the preset's native few-step distilled
        configuration runs (lcm sampler, guidance embedding, batch B not 2B)."""
        img = lcm_pipe.generate("x", token_ids=IDS[None], seed=1)
        assert img.shape == (1, 32, 32, 3)
        # cfg=False compiled bucket: n_ids == 1 (no uncond row)
        assert any(k[2] is False and k[1] == 2 for k in lcm_pipe._compiled)

    def test_explicit_args_override_defaults(self, lcm_pipe):
        a = lcm_pipe.generate("x", token_ids=IDS[None], seed=1)
        b = lcm_pipe.generate("x", token_ids=IDS[None], seed=1,
                              num_inference_steps=3)
        assert a.shape == b.shape
        assert (a != b).any()

    def test_generate_batch_uses_defaults(self, lcm_pipe):
        imgs = lcm_pipe.generate_batch(
            ["a", "b"], token_ids=np.stack([IDS, IDS]), seeds=[1, 2]
        )
        assert imgs.shape == (2, 32, 32, 3)

    def test_serving_resolves_defaults_into_bucket(self, lcm_pipe):
        engine = ServingEngine(lcm_pipe, max_batch_size=2, max_wait_ms=30)
        try:
            f1 = engine.submit("p", token_ids=IDS, seed=1)
            f2 = engine.submit("p", token_ids=IDS, seed=2)
            imgs = [f.result(300) for f in (f1, f2)]
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert all(i.shape == (32, 32, 3) for i in imgs)
        # both resolved to the same (default) bucket -> coalesced
        assert stats["batches"] <= 2
