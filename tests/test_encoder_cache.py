"""Encoder-feature reuse (the Faster Diffusion / DeepCache approximation):
groups of k steps run the UNet encoder once and decoder-only in between,
reusing the cached (mid, skips) with the current step's time projections.

k=1 must be the untouched baseline program; the k>1 semantics are pinned by
an EXACT manual composition out of the public unet_encode/unet_decode +
sampler pieces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.clip import clip_encode
from sdtpu.models.unet import (
    precompute_cross_kv,
    precompute_time_projections,
    unet_decode,
    unet_encode,
    unet_forward,
)
from sdtpu.samplers import get_sampler

from test_pipeline import TINY, TOKENS


class TestUNetSplit:
    def test_encode_decode_composition_is_unet_forward(self, rng):
        """The split halves compose to exactly unet_forward (the refactor
        must be a no-op for every existing golden)."""
        from sdtpu.models.unet import compute_time_embedding, init_unet

        cfg = TINY.unet
        params = init_unet(0, cfg)
        lat = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
        ts = jnp.asarray([700.0, 30.0])
        want = unet_forward(lat, ts, ctx, params, cfg)
        temb = compute_time_embedding(ts, params, cfg, batch=2,
                                      dtype=lat.dtype)
        x, skips = unet_encode(lat, temb, ctx, params, cfg)
        got = unet_decode(x, skips, temb, ctx, params, cfg)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestEncoderCachePipeline:
    def test_k1_is_bitwise_baseline(self, tiny_pipe):
        kw = dict(token_ids=TOKENS, num_inference_steps=3, seed=5,
                  sampler="ddim")
        a = tiny_pipe.generate("x", **kw)
        b = tiny_pipe.generate("x", encoder_cache_interval=1, **kw)
        np.testing.assert_array_equal(a, b)

    def test_k_beyond_steps_runs_full(self, tiny_pipe):
        """G == 0 -> every step lands in the full-step tail scan."""
        kw = dict(token_ids=TOKENS, num_inference_steps=3, seed=5,
                  sampler="ddim", output="float")
        a = tiny_pipe.generate("x", **kw)
        b = tiny_pipe.generate("x", encoder_cache_interval=9, **kw)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_cached_steps_approximate(self, tiny_pipe):
        kw = dict(token_ids=TOKENS, num_inference_steps=4, seed=5,
                  sampler="ddim", output="float")
        a = tiny_pipe.generate("x", **kw)
        b = tiny_pipe.generate("x", encoder_cache_interval=2, **kw)
        assert np.abs(a - b).max() > 1e-4  # the approximation is active

    def test_matches_manual_composition(self, tiny_pipe):
        """steps=2, k=2, ddim, cfg off, injected latents: the pipeline must
        equal [full step 0] -> [decoder-only step 1 with step 0's cache] —
        composed by hand from public pieces."""
        pipe = tiny_pipe
        config = pipe.config
        sdef = get_sampler("ddim")
        schedule = sdef.make_schedule(config.scheduler, 2, 1.0)
        rng = np.random.default_rng(3)
        lat0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
        ids = TOKENS[:1]

        got = pipe.generate(
            "x", token_ids=ids, num_inference_steps=2, seed=0, cfg=False,
            sampler="ddim", latents=lat0, output="latents",
            encoder_cache_interval=2,
        )

        context, _ = clip_encode(
            jnp.asarray(ids), pipe.params["clip"], config.clip
        )
        context = context.astype(jnp.float32)
        kv = precompute_cross_kv(context, pipe.params["unet"], config.unet)
        tc = precompute_time_projections(
            schedule.timesteps, pipe.params["unet"], config.unet, batch=1,
            dtype=jnp.float32,
        )
        lat = jnp.asarray(lat0)
        zeros = jnp.zeros_like(lat)
        tc0 = jax.tree.map(lambda a: a[0], tc)
        x, sk = unet_encode(lat, tc0["temb"], context, pipe.params["unet"],
                            config.unet, cross_kv=kv, time_proj=tc0)
        eps0 = unet_decode(x, sk, tc0["temb"], context, pipe.params["unet"],
                           config.unet, cross_kv=kv, time_proj=tc0)
        lat = sdef.step(schedule, 0, lat, eps0.astype(jnp.float32), zeros)
        tc1 = jax.tree.map(lambda a: a[1], tc)
        eps1 = unet_decode(x, sk, tc1["temb"], context, pipe.params["unet"],
                           config.unet, cross_kv=kv, time_proj=tc1)
        want = sdef.step(schedule, 1, lat, eps1.astype(jnp.float32), zeros)
        np.testing.assert_allclose(
            np.asarray(got)[0], np.asarray(want)[0], atol=1e-5, rtol=1e-5
        )

    def test_remainder_steps_run_full(self, tiny_pipe):
        """steps=5, k=2: steps 4 (the remainder) runs full — pinned by
        comparing against steps=4,k=2 continued by one full step via the
        schedule-slicing machinery being unnecessary here; instead just
        assert the program runs and stays finite at an odd count."""
        img = tiny_pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=5, seed=5,
            sampler="ddim", encoder_cache_interval=2, output="float",
        )
        assert np.isfinite(img).all()

    def test_controlnet_rejected(self, tiny_pipe):
        from sdtpu.models.controlnet import init_controlnet

        tiny_pipe.load_controlnet(init_controlnet(0, TINY.unet, cond_channels=(4, 8, 16)
        ))
        try:
            with pytest.raises(ValueError, match="incompatible"):
                tiny_pipe.generate(
                    "x", token_ids=TOKENS, num_inference_steps=2,
                    control_image=np.zeros((32, 32, 3), np.uint8),
                    encoder_cache_interval=2,
                )
        finally:
            tiny_pipe.controlnet = None

    def test_stochastic_sampler_and_serving(self, tiny_pipe):
        from sdtpu.pipeline.serving import ServingEngine

        img = tiny_pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=4, seed=5,
            encoder_cache_interval=2,
        )
        assert img.shape == (1, 32, 32, 3)
        direct = tiny_pipe.generate_batch(
            ["p"], token_ids=TOKENS[:1], num_inference_steps=4, seeds=[5],
            encoder_cache_interval=2,
        )
        engine = ServingEngine(tiny_pipe, max_batch_size=2, max_wait_ms=30)
        try:
            got = engine.submit(
                "p", token_ids=TOKENS[0], seed=5, num_inference_steps=4,
                image_size=32, encoder_cache_interval=2,
            ).result(300)
            # cached and uncached requests must not share a program bucket
            f2 = engine.submit(
                "p", token_ids=TOKENS[0], seed=5, num_inference_steps=4,
                image_size=32,
            )
            f2.result(300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        np.testing.assert_array_equal(got, direct[0])
        assert stats["batches"] == 2
