"""UNet tests: component golden vs torch mirrors + structural/jit checks.

The skip-concat wiring is self-verifying: ``init_unet`` derives every decoder
resnet's input width from the same LIFO skip bookkeeping diffusers uses
(SURVEY.md §2.3), so any forward/init mismatch is a hard shape error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sdtpu.config import UNetConfig, SD15, SD21, SDXL_BASE, TINY_SD
from sdtpu.models.unet import (
    attention_block,
    init_unet,
    resnet_block,
    unet_forward,
)

from conftest import assert_allclose

# A shrunken Tiny-SD: same topology, tiny widths (multiples of groups=8).
TINY_TEST = UNetConfig(
    block_out_channels=(32, 64, 128),
    layers_per_block=1,
    attention_levels=(True, True, True),
    num_attention_heads=4,
    cross_attention_dim=24,
    norm_num_groups=8,
)


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def torch_conv(x_nhwc, p, stride=1, padding=1):
    w = t(np.asarray(p["kernel"])).permute(3, 2, 0, 1)
    return F.conv2d(x_nhwc.permute(0, 3, 1, 2), w, t(np.asarray(p["bias"])),
                    stride=stride, padding=padding).permute(0, 2, 3, 1)


def torch_gn(x_nhwc, p, groups, eps=1e-5):
    return F.group_norm(
        x_nhwc.permute(0, 3, 1, 2), groups,
        t(np.asarray(p["scale"])), t(np.asarray(p["bias"])), eps=eps,
    ).permute(0, 2, 3, 1)


class TestResnetBlock:
    @pytest.mark.parametrize("in_ch,out_ch", [(32, 32), (32, 64)])
    def test_matches_torch(self, rng, in_ch, out_ch):
        from sdtpu.models.unet import _init_resnet

        params = _init_resnet(jax.random.key(0), in_ch, out_ch, 48, dtype=jnp.float32)
        x = rng.standard_normal((2, 8, 8, in_ch), dtype=np.float32)
        temb = rng.standard_normal((2, 48), dtype=np.float32)

        ours = resnet_block(jnp.array(x), jnp.array(temb), params, num_groups=8)

        # torch mirror of Unet_Residual_Block (diffusion.mojo:54-72, fixed
        # GroupNorm semantics)
        h = torch_gn(t(x), params["norm1"], 8)
        h = F.silu(h)
        h = torch_conv(h, params["conv1"])
        tt = t(temb) @ t(np.asarray(params["time_emb_proj"]["kernel"])) + t(
            np.asarray(params["time_emb_proj"]["bias"]))
        h = h + tt[:, None, None, :]
        h = torch_gn(h, params["norm2"], 8)
        h = F.silu(h)
        h = torch_conv(h, params["conv2"])
        xt = t(x)
        if "conv_shortcut" in params:
            xt = torch_conv(xt, params["conv_shortcut"], padding=0)
        expected = xt + h

        assert_allclose(ours, expected.numpy(), atol=1e-4, rtol=1e-3)


class TestAttentionBlock:
    def test_matches_torch(self, rng):
        from sdtpu.models.unet import _init_attn_block
        from sdtpu.ops import transformer_block

        ch, heads, ctx_dim = 32, 4, 24
        params = _init_attn_block(jax.random.key(1), ch, 1, ctx_dim, dtype=jnp.float32)
        x = rng.standard_normal((1, 4, 4, ch), dtype=np.float32)
        ctx = rng.standard_normal((1, 5, ctx_dim), dtype=np.float32)

        ours = attention_block(
            jnp.array(x), jnp.array(ctx), params, num_heads=heads, num_groups=8
        )

        # mirror: GN(eps 1e-6) -> flatten -> proj_in -> block -> proj_out + res
        h = torch_gn(t(x), params["norm"], 8, eps=1e-6).reshape(1, 16, ch)
        h = h @ t(np.asarray(params["proj_in"]["kernel"])) + t(
            np.asarray(params["proj_in"]["bias"]))
        h = np.asarray(
            transformer_block(jnp.array(h.numpy()), params["blocks"][0],
                              num_heads=heads, context=jnp.array(ctx))
        )
        h = t(h) @ t(np.asarray(params["proj_out"]["kernel"])) + t(
            np.asarray(params["proj_out"]["bias"]))
        expected = h.reshape(1, 4, 4, ch) + t(x)

        assert_allclose(ours, expected.numpy(), atol=1e-4, rtol=1e-3)


class TestUNetStructure:
    def test_tiny_forward_shapes(self):
        params = init_unet(0, TINY_TEST)
        x = jnp.zeros((2, 16, 16, 4))
        ctx = jnp.zeros((2, 7, TINY_TEST.cross_attention_dim))
        fn = jax.jit(lambda p, a, ts, c: unet_forward(a, ts, c, p, TINY_TEST))
        out = fn(params, x, jnp.array([500.0, 500.0]), ctx)
        assert out.shape == (2, 16, 16, 4)

    def test_cfg_batched_two(self):
        """CFG as one batched call (replaces the reference's two sequential
        identical forwards, pipeline.mojo:107-110)."""
        params = init_unet(0, TINY_TEST)
        lat = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        ctx_cond = jax.random.normal(jax.random.key(2), (1, 7, 24))
        ctx_uncond = jnp.zeros((1, 7, 24))

        fn = jax.jit(lambda p, a, ts, c: unet_forward(a, ts, c, p, TINY_TEST))
        batched = fn(
            params,
            jnp.concatenate([lat, lat]),
            jnp.array([10.0, 10.0]),
            jnp.concatenate([ctx_cond, ctx_uncond]),
        )
        solo_cond = fn(params, lat, jnp.array([10.0]), ctx_cond)
        solo_uncond = fn(params, lat, jnp.array([10.0]), ctx_uncond)
        assert_allclose(batched[0], solo_cond[0], atol=1e-4, rtol=1e-3)
        assert_allclose(batched[1], solo_uncond[0], atol=1e-4, rtol=1e-3)

    def test_sd15_topology(self):
        """SD 1.5: 4 levels, mid block, no attention at deepest level."""
        cfg = UNetConfig(
            block_out_channels=(16, 24, 32, 32),
            layers_per_block=2,
            attention_levels=(True, True, True, False),
            transformer_layers_per_block=(1, 1, 1, 1),
            num_attention_heads=4,
            cross_attention_dim=16,
            mid_block=True,
            norm_num_groups=8,
        )
        params = init_unet(0, cfg)
        x = jnp.zeros((1, 32, 32, 4))
        out = jax.jit(lambda p, a, ts, c: unet_forward(a, ts, c, p, cfg))(
            params, x, jnp.array([1.0]), jnp.zeros((1, 7, 16))
        )
        assert out.shape == (1, 32, 32, 4)

    def test_sdxl_topology(self):
        """SDXL shape: no attn at level 0, depth (1,2,N), addition embeds,
        head_dim-64 sentinel."""
        cfg = UNetConfig(
            block_out_channels=(64, 128, 256),
            layers_per_block=2,
            attention_levels=(False, True, True),
            transformer_layers_per_block=(1, 2, 2),
            num_attention_heads=0,
            cross_attention_dim=32,
            mid_block=True,
            norm_num_groups=8,
            addition_embed_dim=64,
            addition_time_embed_dim=8,
        )
        params = init_unet(0, cfg)
        x = jnp.zeros((2, 32, 32, 4))
        added = {
            "text_embeds": jnp.zeros((2, 64 - 6 * 8)),
            "time_ids": jnp.zeros((2, 6)),
        }
        out = jax.jit(
            lambda p, a, ts, c: unet_forward(
                a, ts, c, p, cfg, added_cond=added
            )
        )(params, x, jnp.array([1.0, 2.0]), jnp.zeros((2, 7, 32)))
        assert out.shape == (2, 32, 32, 4)

    def test_cross_kv_cache_matches_uncached(self):
        """Scan-hoisted cross-attention K/V (precompute_cross_kv) must give
        numbers identical to computing the projections in-place."""
        from sdtpu.models.unet import precompute_cross_kv

        params = init_unet(0, TINY_TEST)
        lat = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(2), (2, 7, 24))
        ts = jnp.array([500.0, 10.0])
        cache = precompute_cross_kv(ctx, params, TINY_TEST)
        a = unet_forward(lat, ts, ctx, params, TINY_TEST)
        b = unet_forward(lat, ts, ctx, params, TINY_TEST, cross_kv=cache)
        assert_allclose(a, b, atol=1e-6, rtol=1e-6)

    def test_cross_kv_cache_with_mid_block(self):
        from sdtpu.models.unet import precompute_cross_kv

        cfg = UNetConfig(
            block_out_channels=(16, 24, 32),
            layers_per_block=1,
            attention_levels=(False, True, True),
            transformer_layers_per_block=(1, 2, 2),
            num_attention_heads=2,
            cross_attention_dim=24,
            mid_block=True,
            norm_num_groups=8,
        )
        params = init_unet(3, cfg)
        lat = jax.random.normal(jax.random.key(4), (1, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(5), (1, 7, 24))
        ts = jnp.array([77.0])
        cache = precompute_cross_kv(ctx, params, cfg)
        a = unet_forward(lat, ts, ctx, params, cfg)
        b = unet_forward(lat, ts, ctx, params, cfg, cross_kv=cache)
        assert_allclose(a, b, atol=1e-6, rtol=1e-6)

    def test_time_projection_cache_matches_uncached(self):
        """Scan-hoisted time MLP + per-resblock time_emb_proj
        (precompute_time_projections) must reproduce the in-forward path
        for every step of a schedule."""
        from sdtpu.models.unet import precompute_time_projections

        params = init_unet(0, TINY_TEST)
        lat = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(2), (2, 7, 24))
        timesteps = jnp.array([981.0, 500.0, 21.0])
        cache = precompute_time_projections(
            timesteps, params, TINY_TEST, batch=2, dtype=lat.dtype
        )
        for i in range(3):
            ts = jnp.broadcast_to(timesteps[i], (2,))
            a = unet_forward(lat, ts, ctx, params, TINY_TEST)
            b = unet_forward(
                lat, ts, ctx, params, TINY_TEST,
                time_cache=jax.tree.map(lambda x: x[i], cache),
            )
            assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_time_projection_cache_with_mid_block(self):
        from sdtpu.models.unet import precompute_time_projections

        cfg = UNetConfig(
            block_out_channels=(16, 24, 32),
            layers_per_block=1,
            attention_levels=(False, True, True),
            transformer_layers_per_block=(1, 2, 2),
            num_attention_heads=2,
            cross_attention_dim=24,
            mid_block=True,
            norm_num_groups=8,
        )
        params = init_unet(3, cfg)
        lat = jax.random.normal(jax.random.key(4), (1, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(5), (1, 7, 24))
        timesteps = jnp.array([77.0, 3.0])
        cache = precompute_time_projections(
            timesteps, params, cfg, batch=1, dtype=lat.dtype
        )
        for i in range(2):
            ts = jnp.broadcast_to(timesteps[i], (1,))
            a = unet_forward(lat, ts, ctx, params, cfg)
            b = unet_forward(
                lat, ts, ctx, params, cfg,
                time_cache=jax.tree.map(lambda x: x[i], cache),
            )
            assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_jit_no_recompile_across_timesteps(self):
        params = init_unet(0, TINY_TEST)
        fn = jax.jit(
            lambda p, x, ts, ctx: unet_forward(x, ts, ctx, p, TINY_TEST)
        )
        x = jnp.zeros((1, 16, 16, 4))
        ctx = jnp.zeros((1, 7, 24))
        fn(params, x, jnp.array([1.0]), ctx)
        n0 = fn._cache_size()
        fn(params, x, jnp.array([999.0]), ctx)
        assert fn._cache_size() == n0

    def test_presets_are_consistent(self):
        for cfg in (TINY_SD.unet, SD15.unet, SD21.unet, SDXL_BASE.unet):
            assert len(cfg.attention_levels) == cfg.num_levels
            assert len(cfg.transformer_layers_per_block) == cfg.num_levels
