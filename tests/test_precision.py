"""Precision policy tests: the bf16 compute path must track the f32 path.

Without real checkpoints (zero egress) the BASELINE PSNR-vs-diffusers check
can't run here; this pins the half of it we control — that bf16 compute with
fp32 islands (GroupNorm stats, softmax, scheduler) stays close to full-f32
on identical weights.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.models.unet import init_unet, unet_forward
from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from sdtpu.utils.image import psnr
from sdtpu.utils.weights import cast_pytree

from test_pipeline import TINY, TOKENS


class TestPsnr:
    def test_identical_is_inf(self):
        a = np.zeros((4, 4, 3))
        assert psnr(a, a) == float("inf")

    def test_known_value(self):
        a = np.zeros((10, 10))
        b = a + 0.2  # mse = 0.04, range 2 -> 10*log10(4/0.04) = 20 dB
        assert abs(psnr(a, b) - 20.0) < 1e-6


class TestBf16Fidelity:
    def test_unet_forward_bf16_tracks_f32(self):
        cfg = TINY.unet
        params32 = init_unet(jax.random.key(0), cfg, dtype=jnp.float32)
        params16 = cast_pytree(params32, jnp.bfloat16)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(2), (1, 7, cfg.cross_attention_dim))
        ts = jnp.array([500.0])

        out32 = unet_forward(x, ts, ctx, params32, cfg)
        out16 = unet_forward(
            x.astype(jnp.bfloat16), ts, ctx, params16, cfg
        ).astype(jnp.float32)
        rel = float(
            jnp.linalg.norm(out32 - out16) / (jnp.linalg.norm(out32) + 1e-9)
        )
        assert rel < 0.05, f"bf16 UNet diverges from f32: rel err {rel:.4f}"

    def test_pipeline_bf16_tracks_f32_psnr(self):
        cfg16 = TINY.replace(
            compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
        )
        pipe32 = StableDiffusionPipeline.from_random(TINY, seed=0)
        pipe16 = StableDiffusionPipeline(
            cfg16, cast_pytree(pipe32.params, jnp.bfloat16)
        )
        kw = dict(token_ids=TOKENS, num_inference_steps=3, seed=40,
                  output="float")
        img32 = pipe32.generate("x", **kw)
        img16 = pipe16.generate("x", **kw)
        score = psnr(img32, img16)
        # random weights + 3 denoise steps; bf16 should stay well-correlated
        assert score > 20.0, f"bf16 pipeline PSNR vs f32 too low: {score:.1f} dB"
