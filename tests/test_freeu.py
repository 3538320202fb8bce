"""FreeU (Si et al. 2023, "FreeU: Free Lunch in Diffusion U-Net") —
training-free quality knob: scale the backbone's first-half channels (b1/b2)
and low-pass the skip features (s1/s2) in the UNet's two lowest-resolution
up blocks.  diffusers ``apply_freeu`` semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_pipeline import TOKENS


class TestFourierFilter:
    def test_scale_one_is_identity(self):
        from sdtpu.models.unet import fourier_filter

        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4), jnp.float32)
        y = fourier_filter(x, scale=1.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_scale_zero_kills_constant_map(self):
        """A constant map is pure DC; threshold-1 low-pass at scale 0 must
        zero it (DC sits inside the scaled 2x2 center after fftshift)."""
        from sdtpu.models.unet import fourier_filter

        x = jnp.full((1, 8, 8, 2), 3.0, jnp.float32)
        y = fourier_filter(x, scale=0.0)
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-5)

    def test_high_frequencies_pass_through(self):
        """The highest-frequency checkerboard has no energy in the 2x2
        center region, so any scale leaves it unchanged."""
        from sdtpu.models.unet import fourier_filter

        r = np.indices((8, 8)).sum(axis=0) % 2
        x = jnp.asarray(((-1.0) ** r)[None, :, :, None], jnp.float32)
        y = fourier_filter(x, scale=0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


class TestFreeUPipeline:
    def test_unit_freeu_matches_baseline(self, tiny_pipe):
        """b=s=1 is mathematically the identity (the only difference is the
        skip's FFT round-trip in f32)."""
        base = tiny_pipe.generate("x", token_ids=TOKENS,
                                  num_inference_steps=2, seed=11,
                                  output="float")
        unit = tiny_pipe.generate("x", token_ids=TOKENS,
                                  num_inference_steps=2, seed=11,
                                  output="float",
                                  freeu=(1.0, 1.0, 1.0, 1.0))
        np.testing.assert_allclose(unit, base, atol=1.0)  # uint8 levels

    def test_freeu_changes_output_deterministically(self, tiny_pipe):
        base = tiny_pipe.generate("x", token_ids=TOKENS,
                                  num_inference_steps=2, seed=11)
        fu = tiny_pipe.generate("x", token_ids=TOKENS,
                                num_inference_steps=2, seed=11,
                                freeu=(1.3, 1.4, 0.9, 0.2))
        assert fu.shape == base.shape
        assert not np.array_equal(fu, base)
        again = tiny_pipe.generate("x", token_ids=TOKENS,
                                   num_inference_steps=2, seed=11,
                                   freeu=(1.3, 1.4, 0.9, 0.2))
        np.testing.assert_array_equal(fu, again)

    def test_batch_and_img2img_accept_freeu(self, tiny_pipe):
        imgs = tiny_pipe.generate_batch(
            ["x", "y"], token_ids=TOKENS, num_inference_steps=2,
            freeu=(1.3, 1.4, 0.9, 0.2),
        )
        assert imgs.shape == (2, 32, 32, 3)
        init = np.zeros((32, 32, 3), np.uint8)
        img = tiny_pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=3, seed=2,
            init_image=init, strength=0.7, freeu=(1.3, 1.4, 0.9, 0.2),
        )
        assert img.shape == (1, 32, 32, 3)

    def test_bad_freeu_raises(self, tiny_pipe):
        with pytest.raises(ValueError, match="freeu"):
            tiny_pipe.generate("x", token_ids=TOKENS,
                               num_inference_steps=2, freeu=(1.3, 1.4))


class TestFreeUUnet:
    def test_decode_freeu_touches_only_low_res_blocks(self):
        """FreeU scales the backbone half-channels only in up blocks 0/1;
        with b=s=1 the decode output must match the plain path."""
        from sdtpu.config import UNetConfig
        from sdtpu.models.unet import (
            compute_time_embedding, init_unet, unet_decode, unet_encode,
        )

        cfg = UNetConfig(
            block_out_channels=(16, 24, 32), layers_per_block=1,
            attention_levels=(False, False, False), num_attention_heads=2,
            cross_attention_dim=32, norm_num_groups=8,
        )
        params = init_unet(0, cfg)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4), jnp.float32)
        ctx = jax.random.normal(jax.random.key(2), (1, 8, 32), jnp.float32)
        temb = compute_time_embedding(
            jnp.array(3.0), params, cfg, batch=1, dtype=jnp.float32
        )
        h, skips = unet_encode(x, temb, ctx, params, cfg)
        plain = unet_decode(h, skips, temb, ctx, params, cfg)
        unit = unet_decode(h, skips, temb, ctx, params, cfg,
                           freeu=(1.0, 1.0, 1.0, 1.0))
        np.testing.assert_allclose(
            np.asarray(unit), np.asarray(plain), atol=1e-4
        )
        scaled = unet_decode(h, skips, temb, ctx, params, cfg,
                             freeu=(1.5, 1.6, 0.9, 0.2))
        assert not np.allclose(np.asarray(scaled), np.asarray(plain))
