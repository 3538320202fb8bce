"""Dedicated-inpainting checkpoints (9-channel UNet input: noisy latents ++
latent-grid mask ++ masked-image latents — runwayml/stable-diffusion-
inpainting wiring).  The pipeline routes to the concat path automatically
when ``unet.in_channels == 2 * latent_channels + 1``; the latent-blend
method stays the path for ordinary 4-channel checkpoints.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.pipeline.pipeline import StableDiffusionPipeline

from test_pipeline import TINY, TOKENS

TINY_INPAINT = TINY.replace(
    name="test/tiny-inpaint",
    unet=dataclasses.replace(TINY.unet, in_channels=9),
)


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionPipeline.from_random(TINY_INPAINT, seed=0)


def _mask(size=32):
    m = np.zeros((size, size), np.uint8)
    m[:, 16:] = 255  # right half repainted
    return m


class TestInpaintUNet:
    def test_generates(self, pipe):
        init = np.full((32, 32, 3), 128, np.uint8)
        img = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=1,
            init_image=init, mask_image=_mask(), strength=1.0,
        )
        assert img.shape == (1, 32, 32, 3)
        assert img.dtype == np.uint8

    def test_repaint_region_pixels_do_not_condition(self, pipe):
        """At strength 1.0 the initial latents are pure noise and the
        masked-image latents zero the repaint region — so changing REPAINT
        pixels must not change the output at all, while changing PRESERVED
        pixels must (they reach the UNet through the masked-image
        channels).  This pins the masked-image wiring end to end."""
        init_a = np.full((32, 32, 3), 128, np.uint8)
        init_b = init_a.copy()
        init_b[8, 24] = 255  # inside the repaint (right) half
        init_c = init_a.copy()
        init_c[8, 4] = 255  # inside the preserved (left) half
        kw = dict(token_ids=TOKENS[:1], num_inference_steps=2, seed=1,
                  mask_image=_mask(), strength=1.0)
        a = pipe.generate("x", init_image=init_a, **kw)
        b = pipe.generate("x", init_image=init_b, **kw)
        c = pipe.generate("x", init_image=init_c, **kw)
        np.testing.assert_array_equal(a, b)
        assert np.abs(
            a.astype(np.int32) - c.astype(np.int32)
        ).max() > 0

    def test_mask_itself_conditions(self, pipe):
        """Different masks (same init) must produce different images —
        the mask channel reaches the UNet."""
        init = np.full((32, 32, 3), 128, np.uint8)
        m2 = np.zeros((32, 32), np.uint8)
        m2[16:, :] = 255  # bottom half instead of right half
        kw = dict(token_ids=TOKENS[:1], num_inference_steps=2, seed=1,
                  strength=1.0)
        a = pipe.generate("x", init_image=init, mask_image=_mask(), **kw)
        b = pipe.generate("x", init_image=init, mask_image=m2, **kw)
        assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() > 0

    def test_partial_strength_uses_image_latents(self, pipe):
        """strength < 1 noises the ACTUAL image latents (the img2img-style
        inpaint refinement mode) — repaint-region pixels then DO condition
        the output through lat0."""
        init_a = np.full((32, 32, 3), 128, np.uint8)
        init_b = init_a.copy()
        init_b[8, 24] = 255  # repaint region
        kw = dict(token_ids=TOKENS[:1], num_inference_steps=4, seed=1,
                  mask_image=_mask(), strength=0.5)
        a = pipe.generate("x", init_image=init_a, **kw)
        b = pipe.generate("x", init_image=init_b, **kw)
        assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() > 0

    def test_batch_and_serving_compose(self, pipe):
        from sdtpu.pipeline.serving import ServingEngine

        init = np.full((32, 32, 3), 100, np.uint8)
        imgs = pipe.generate_batch(
            ["a", "b"], token_ids=np.tile(TOKENS[:1], (2, 1)),
            num_inference_steps=2, seeds=[1, 2],
            init_images=[init, init], mask_images=[_mask(), _mask()],
            strength=1.0,
        )
        assert imgs.shape == (2, 32, 32, 3)
        direct = pipe.generate_batch(
            ["p"], token_ids=TOKENS[:1], num_inference_steps=2, seeds=[5],
            init_images=[init], mask_images=[_mask()], strength=1.0,
        )
        engine = ServingEngine(pipe, max_batch_size=2, max_wait_ms=30)
        try:
            got = engine.submit(
                "p", token_ids=TOKENS[0], seed=5, num_inference_steps=2,
                image_size=32, init_image=init, mask_image=_mask(),
                strength=1.0,
            ).result(300)
        finally:
            engine.shutdown()
        np.testing.assert_array_equal(got, direct[0])

    def test_plain_txt2img_rejected_shapewise(self, pipe):
        """A 9-channel checkpoint needs init+mask: plain txt2img would feed
        4 channels into a 9-channel conv_in — surfaced as an error, not
        silently wrong."""
        with pytest.raises(Exception):
            pipe.generate("x", token_ids=TOKENS[:1], num_inference_steps=1)

    def test_sdxl_topology_inpaint(self):
        """The 9-channel wiring composes with SDXL micro-conditioning
        (the sdxl-inpaint preset's shape)."""
        from test_pipeline_sdxl import TINY_XL

        cfg = TINY_XL.replace(
            name="test/tiny-xl-inpaint",
            # head_dim-64 sentinel would give 0 heads at tiny widths
            unet=dataclasses.replace(TINY_XL.unet, in_channels=9,
                                     num_attention_heads=2),
        )
        pipe = StableDiffusionPipeline.from_random(cfg, seed=0)
        ids = np.array([[1, 5, 9, 2] + [0] * 8, [1, 2] + [0] * 10])
        init = np.full((32, 32, 3), 128, np.uint8)
        img = pipe.generate(
            "x", token_ids=ids, num_inference_steps=2, seed=1,
            init_image=init, mask_image=_mask(), strength=1.0,
        )
        assert img.shape == (1, 32, 32, 3)

    def test_blend_path_unaffected_for_4ch(self, tiny_pipe):
        """Ordinary checkpoints keep the latent-blend inpainting (mask at
        the LATENT grid internally) — frozen behavior."""
        init = np.full((32, 32, 3), 128, np.uint8)
        img = tiny_pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3,
            init_image=init, mask_image=_mask(), strength=1.0,
        )
        assert img.shape == (1, 32, 32, 3)
