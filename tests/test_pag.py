"""Perturbed-Attention Guidance (PAG; Ahn et al. 2024, "Self-Rectifying
Diffusion Sampling with Perturbed-Attention Guidance"; diffusers
``pag_scale``) — a third guidance branch whose self-attention at the PAG
site is replaced by IDENTITY attention (each query attends only to itself,
so the attention output degenerates to out_proj(V(h))).

Beyond-reference surface (the Mojo reference has CFG only,
``pipeline.mojo:111-119``).  Semantics pinned by exact manual composition:
the op-level identity form, the UNet tail-row split, and the pipeline
combine are each checked against independently computed references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.ops.attention import (
    attention,
    init_transformer_block,
    transformer_block,
)
from sdtpu.ops.linear import linear
from sdtpu.ops.norm import layer_norm
from sdtpu.ops.activations import geglu

from test_pipeline import TOKENS

from conftest import assert_allclose


@pytest.fixture(scope="module")
def block_params():
    return init_transformer_block(jax.random.key(3), 32, context_dim=24)


@pytest.fixture(scope="module")
def block_inputs():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, 16, 32)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((3, 7, 24)), jnp.float32)
    return x, ctx


class TestIdentityAttention:
    def test_full_tail_matches_manual_composition(self, block_params,
                                                  block_inputs):
        """pag_tail == batch: every row's self-attention must equal the
        hand-computed identity form x + out_proj(V(LN(x))), followed by the
        block's unchanged cross-attention and FF."""
        p = block_params
        x, ctx = block_inputs
        got = transformer_block(x, p, num_heads=4, context=ctx,
                                pag_tail=x.shape[0])

        h = layer_norm(x, p["norm1"])
        xa = x + linear(linear(h, p["attn1"]["v"]), p["attn1"]["out"])
        h = layer_norm(xa, p["norm2"])
        xa = xa + attention(h, p["attn2"], num_heads=4, context=ctx)
        h = layer_norm(xa, p["norm3"])
        want = xa + linear(geglu(linear(h, p["ff"]["proj"])), p["ff"]["out"])
        assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_head_rows_unperturbed(self, block_params, block_inputs):
        """pag_tail=1 must leave the non-tail rows identical to the
        unperturbed block (self-attention is row-independent) and change
        the tail row."""
        p = block_params
        x, ctx = block_inputs
        base = transformer_block(x, p, num_heads=4, context=ctx)
        mixed = transformer_block(x, p, num_heads=4, context=ctx, pag_tail=1)
        assert_allclose(mixed[:2], base[:2], rtol=1e-5, atol=1e-6)
        assert not np.allclose(np.asarray(mixed[2]), np.asarray(base[2]),
                               atol=1e-4)


class TestUNetPagTail:
    @pytest.mark.parametrize("mid", [False, True], ids=["deepest", "mid"])
    def test_tail_split_equals_per_branch_forwards(self, mid):
        """A pag_tail=1 forward on a duplicated-row batch must reproduce,
        row for row, the pag_tail=0 forward (head row) and the
        all-rows-perturbed forward (tail row)."""
        from sdtpu.config import UNetConfig
        from sdtpu.models.unet import init_unet, unet_forward

        config = UNetConfig(
            block_out_channels=(16, 24),
            layers_per_block=1,
            attention_levels=(True, True),
            num_attention_heads=2,
            cross_attention_dim=24,
            norm_num_groups=8,
            mid_block=mid,
        )
        params = init_unet(0, config)
        rng = np.random.default_rng(5)
        row = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
        x = jnp.asarray(np.concatenate([row, row]))
        crow = rng.standard_normal((1, 6, 24)).astype(np.float32)
        ctx = jnp.asarray(np.concatenate([crow, crow]))
        t = jnp.asarray([3.0, 3.0], jnp.float32)

        mixed = unet_forward(x, t, ctx, params, config, pag_tail=1)
        clean = unet_forward(x, t, ctx, params, config)
        pert = unet_forward(x, t, ctx, params, config, pag_tail=2)
        assert_allclose(mixed[0], clean[0], rtol=1e-4, atol=1e-5)
        assert_allclose(mixed[1], pert[1], rtol=1e-4, atol=1e-5)
        # and the perturbation actually reaches the output
        assert not np.allclose(np.asarray(clean[1]), np.asarray(pert[1]),
                               atol=1e-4)


class TestPagPipeline:
    def test_zero_is_the_default_program(self, tiny_pipe):
        a = tiny_pipe.generate("x", token_ids=TOKENS, num_inference_steps=2,
                               seed=5)
        n = len(tiny_pipe._compiled)
        b = tiny_pipe.generate("x", token_ids=TOKENS, num_inference_steps=2,
                               seed=5, pag_scale=0.0)
        np.testing.assert_array_equal(a, b)
        assert len(tiny_pipe._compiled) == n  # 0.0 keys to the same program

    def test_nonzero_changes_output_deterministically(self, tiny_pipe):
        base = tiny_pipe.generate("x", token_ids=TOKENS,
                                  num_inference_steps=2, seed=5)
        r = tiny_pipe.generate("x", token_ids=TOKENS, num_inference_steps=2,
                               seed=5, pag_scale=3.0)
        assert r.shape == base.shape
        assert not np.array_equal(r, base)
        again = tiny_pipe.generate("x", token_ids=TOKENS,
                                   num_inference_steps=2, seed=5,
                                   pag_scale=3.0)
        np.testing.assert_array_equal(r, again)

    def test_works_without_cfg(self, tiny_pipe):
        base = tiny_pipe.generate("x", token_ids=TOKENS[:1],
                                  num_inference_steps=2, seed=5, cfg=False)
        r = tiny_pipe.generate("x", token_ids=TOKENS[:1],
                               num_inference_steps=2, seed=5, cfg=False,
                               pag_scale=2.0)
        assert r.shape == base.shape
        assert not np.array_equal(r, base)

    def test_composes_with_guidance_rescale(self, tiny_pipe):
        r = tiny_pipe.generate("x", token_ids=TOKENS, num_inference_steps=2,
                               seed=5, pag_scale=2.0, guidance_rescale=0.5)
        assert r.shape == (1, 32, 32, 3)

    def test_batch_accepts_pag(self, tiny_pipe):
        imgs = tiny_pipe.generate_batch(
            ["x", "y"], token_ids=TOKENS, num_inference_steps=2,
            pag_scale=2.0,
        )
        assert imgs.shape == (2, 32, 32, 3)

    def test_num_images_forwards_pag(self, tiny_pipe):
        """generate(num_images=N) delegates to generate_batch — pag_scale
        must survive the delegation (it was silently dropped once)."""
        plain = tiny_pipe.generate("x", token_ids=TOKENS,
                                   num_inference_steps=2, seed=5,
                                   num_images=2)
        pag = tiny_pipe.generate("x", token_ids=TOKENS,
                                 num_inference_steps=2, seed=5,
                                 num_images=2, pag_scale=3.0)
        assert pag.shape == plain.shape == (2, 32, 32, 3)
        assert not np.array_equal(pag, plain)

    def test_negative_rejected(self, tiny_pipe):
        with pytest.raises(ValueError, match="pag_scale"):
            tiny_pipe.generate("x", token_ids=TOKENS, num_inference_steps=2,
                               pag_scale=-1.0)

    def test_img2img_accepts_pag(self, tiny_pipe):
        init = np.zeros((32, 32, 3), np.uint8)
        img = tiny_pipe.generate("x", token_ids=TOKENS,
                                 num_inference_steps=2, seed=5,
                                 init_image=init, pag_scale=2.0)
        assert img.shape == (1, 32, 32, 3)
