"""InstructPix2Pix editing checkpoints (8-channel UNet: noisy latents ++
the conditioning image's unscaled posterior-mode latents; three guidance
branches [text+image, image-only, unconditional] combined with cfg_scale +
image_guidance_scale — timbrooks/instruct-pix2pix wiring)."""

import dataclasses

import numpy as np
import pytest

from sdtpu.config import get_preset
from sdtpu.pipeline.pipeline import StableDiffusionPipeline

from test_pipeline import TINY, TOKENS

TINY_EDIT = TINY.replace(
    name="test/tiny-edit",
    unet=dataclasses.replace(TINY.unet, in_channels=8),
)


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionPipeline.from_random(TINY_EDIT, seed=0)


INIT = np.full((32, 32, 3), 128, np.uint8)


class TestInstructPix2Pix:
    def test_preset_registered(self):
        cfg = get_preset("ip2p")
        assert cfg.unet.in_channels == 8
        assert cfg is get_preset("timbrooks/instruct-pix2pix")

    def test_edit_generates(self, pipe):
        img = pipe.generate(
            "make it snow", token_ids=TOKENS, num_inference_steps=2, seed=1,
            init_image=INIT,
        )
        assert img.shape == (1, 32, 32, 3)
        assert img.dtype == np.uint8

    def test_both_guidance_scales_steer(self, pipe):
        kw = dict(token_ids=TOKENS, num_inference_steps=2, seed=1,
                  init_image=INIT, output="float")
        base = pipe.generate("x", cfg_scale=7.5, image_guidance_scale=1.5,
                             **kw)
        ig = pipe.generate("x", cfg_scale=7.5, image_guidance_scale=3.0,
                           **kw)
        tg = pipe.generate("x", cfg_scale=3.0, image_guidance_scale=1.5,
                           **kw)
        assert np.abs(base - ig).max() > 1e-4
        assert np.abs(base - tg).max() > 1e-4

    def test_unit_scales_collapse_to_text_image_branch(self, pipe):
        """At cfg_scale == image_guidance_scale == 1.0 the combination is
        algebraically the text+image branch alone — which is exactly the
        cfg=False program.  Pins the branch ordering (a swapped chunk
        order would break this)."""
        kw = dict(token_ids=TOKENS[:1], num_inference_steps=2, seed=1,
                  init_image=INIT, output="float")
        three_branch = pipe.generate(
            "x", cfg=True, cfg_scale=1.0, image_guidance_scale=1.0,
            token_ids=TOKENS, num_inference_steps=2, seed=1,
            init_image=INIT, output="float",
        )
        single = pipe.generate("x", cfg=False, **kw)
        np.testing.assert_allclose(three_branch, single, atol=1e-4,
                                   rtol=1e-4)

    def test_image_conditions_output(self, pipe):
        other = np.zeros((32, 32, 3), np.uint8)
        kw = dict(token_ids=TOKENS, num_inference_steps=2, seed=1)
        a = pipe.generate("x", init_image=INIT, **kw)
        b = pipe.generate("x", init_image=other, **kw)
        assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() > 0

    def test_strength_is_ignored(self, pipe):
        """Edit models denoise from pure noise: strength must not change
        the schedule or the image."""
        kw = dict(token_ids=TOKENS, num_inference_steps=2, seed=1,
                  init_image=INIT)
        a = pipe.generate("x", strength=0.3, **kw)
        b = pipe.generate("x", strength=0.9, **kw)
        np.testing.assert_array_equal(a, b)

    def test_mask_rejected(self, pipe):
        with pytest.raises(ValueError, match="no mask"):
            pipe.generate(
                "x", token_ids=TOKENS, num_inference_steps=1,
                init_image=INIT, mask_image=np.zeros((32, 32), np.uint8),
            )

    def test_batch_and_serving(self, pipe):
        from sdtpu.pipeline.serving import ServingEngine

        imgs = pipe.generate_batch(
            ["a", "b"], token_ids=np.tile(TOKENS[:1], (2, 1)),
            num_inference_steps=2, seeds=[1, 2],
            init_images=[INIT, INIT], image_guidance_scale=2.0,
        )
        assert imgs.shape == (2, 32, 32, 3)
        direct = pipe.generate_batch(
            ["p"], token_ids=TOKENS[:1], num_inference_steps=2, seeds=[5],
            init_images=[INIT], image_guidance_scale=2.0,
        )
        engine = ServingEngine(pipe, max_batch_size=2, max_wait_ms=30)
        try:
            got = engine.submit(
                "p", token_ids=TOKENS[0], seed=5, num_inference_steps=2,
                image_size=32, init_image=INIT, image_guidance_scale=2.0,
            ).result(300)
        finally:
            engine.shutdown()
        np.testing.assert_array_equal(got, direct[0])
