"""SDXL-style dual-encoder pipeline path + batched serving, on tiny configs."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import (
    CLIPConfig,
    PipelineConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from sdtpu.pipeline.pipeline import StableDiffusionPipeline

TINY_XL = PipelineConfig(
    name="test/tiny-xl",
    clip=CLIPConfig(
        vocab_size=256, hidden_size=16, intermediate_size=32,
        num_layers=2, num_heads=2, max_length=12,
        use_final_layer_norm_output=False,
    ),
    clip_2=CLIPConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, max_length=12,
        use_final_layer_norm_output=False, projection_dim=32,
    ),
    unet=UNetConfig(
        block_out_channels=(16, 24, 32),
        layers_per_block=1,
        attention_levels=(False, True, True),
        transformer_layers_per_block=(1, 1, 2),
        num_attention_heads=0,  # head_dim-64 sentinel -> but dims small: see below
        cross_attention_dim=16 + 32,
        mid_block=True,
        norm_num_groups=8,
        addition_embed_dim=32 + 6 * 4,  # pooled(32) + 6 time ids * 8dim? see cfg
        addition_time_embed_dim=4,
    ),
    vae=VAEConfig(block_out_channels=(8, 16, 16), layers_per_block=1,
                  norm_num_groups=8, scaling_factor=0.13025),
    scheduler=SchedulerConfig(),
    default_image_size=32,
    compute_dtype=jnp.float32,
    param_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def pipe():
    import dataclasses

    # head_dim-64 sentinel would give 0 heads on tiny widths; use 2 heads
    cfg = TINY_XL.replace(
        unet=dataclasses.replace(TINY_XL.unet, num_attention_heads=2)
    )
    return StableDiffusionPipeline.from_random(cfg, seed=0)


TOKENS = np.array([[1, 9, 200, 3] + [0] * 8, [1, 2] + [0] * 10])


class TestSDXLPath:
    def test_dual_encoder_generate(self, pipe):
        img = pipe.generate("x", token_ids=TOKENS, num_inference_steps=2, seed=0)
        assert img.shape == (1, 32, 32, 3)
        assert img.dtype == np.uint8

    def test_euler_few_step(self, pipe):
        """Turbo-style: 1-step euler, no CFG."""
        img = pipe.generate("x", token_ids=TOKENS[:1], num_inference_steps=1,
                            seed=0, cfg=False, sampler="euler")
        assert img.shape == (1, 32, 32, 3)


class TestBatchServing:
    def test_generate_batch_shapes(self):
        from test_pipeline import TINY

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        ids = np.array([
            [1, 5, 9, 2] + [0] * 12,
            [3, 3, 3, 3] + [0] * 12,
            [7, 1, 0, 0] + [0] * 12,
        ])
        imgs = pipe.generate_batch(
            ["a", "b", "c"], token_ids=ids, num_inference_steps=2, seed=0
        )
        assert imgs.shape == (3, 32, 32, 3)
        # different prompts must produce different images
        assert (imgs[0] != imgs[1]).any() and (imgs[1] != imgs[2]).any()

    def test_generate_batch_deterministic(self):
        from test_pipeline import TINY

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        ids = np.array([[1, 5, 9, 2] + [0] * 12, [3, 3, 3, 3] + [0] * 12])
        a = pipe.generate_batch(["a", "b"], token_ids=ids,
                                num_inference_steps=2, seed=5)
        b = pipe.generate_batch(["a", "b"], token_ids=ids,
                                num_inference_steps=2, seed=5)
        np.testing.assert_array_equal(a, b)

    def test_generate_batch_no_cfg(self):
        from test_pipeline import TINY

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        ids = np.array([[1, 5, 9, 2] + [0] * 12, [3, 3, 3, 3] + [0] * 12])
        imgs = pipe.generate_batch(["a", "b"], token_ids=ids, cfg=False,
                                   num_inference_steps=2, seed=0)
        assert imgs.shape == (2, 32, 32, 3)
