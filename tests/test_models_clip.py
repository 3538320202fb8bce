"""CLIP text-encoder golden test against HF transformers' CLIPTextModel.

The reference's CLIP (``clip.mojo``) is verified against nothing; here the
whole 12-layer stack must reproduce the canonical implementation bit-for-bit
(within fp32 tolerance) with shared random weights — this pins the causal
mask, QuickGELU, pre-LN residual wiring, and the weight-mapping transposes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sdtpu.config import CLIPConfig
from sdtpu.models.clip import clip_encode, init_clip
from sdtpu.utils.weights import clip_params_from_state_dict

from conftest import assert_allclose

SMALL = CLIPConfig(
    vocab_size=1000,
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    max_length=16,
)


def make_hf_model(cfg: CLIPConfig, act="quick_gelu"):
    from transformers import CLIPTextConfig, CLIPTextModel

    hf_cfg = CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_length,
        hidden_act=act,
        # Real CLIP's EOS (49407) is also the max token id, so HF's
        # first-EOS pooling equals our argmax-of-ids pooling; mirror that
        # property in the small test vocab.
        eos_token_id=cfg.vocab_size - 1,
    )
    torch.manual_seed(0)
    return CLIPTextModel(hf_cfg).eval()


class TestClipVsTransformers:
    def test_hidden_states_match(self):
        model = make_hf_model(SMALL)
        params = clip_params_from_state_dict(model.state_dict(), SMALL)
        ids = np.array([[49, 2, 777, 5, 0, 0, 3, 1] + [0] * 8,
                        [1, 2, 3, 4, 5, 6, 7, 8] + [9] * 8])
        with torch.no_grad():
            expected = model(torch.from_numpy(ids)).last_hidden_state.numpy()
        hidden, _ = clip_encode(jnp.array(ids), params, SMALL)
        assert_allclose(hidden, expected, atol=1e-4, rtol=1e-3)

    def test_pooled_output_matches(self):
        model = make_hf_model(SMALL)
        params = clip_params_from_state_dict(model.state_dict(), SMALL)
        # argmax-of-ids pooling convention: put the max id mid-sequence
        ids = np.array([[5, 7, 999, 3, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
        with torch.no_grad():
            expected = model(torch.from_numpy(ids)).pooler_output.numpy()
        _, pooled = clip_encode(jnp.array(ids), params, SMALL)
        assert_allclose(pooled, expected, atol=1e-4, rtol=1e-3)

    def test_gelu_variant(self):
        cfg = CLIPConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, max_length=16, hidden_act="gelu",
        )
        model = make_hf_model(cfg, act="gelu")
        params = clip_params_from_state_dict(model.state_dict(), cfg)
        ids = np.array([[1, 2, 3, 4, 5, 6, 7, 8, 0, 0, 0, 0, 0, 0, 0, 0]])
        with torch.no_grad():
            expected = model(torch.from_numpy(ids)).last_hidden_state.numpy()
        hidden, _ = clip_encode(jnp.array(ids), params, cfg)
        # both erf-exact now — same tight tolerance as the quick_gelu path
        assert_allclose(hidden, expected, atol=1e-4, rtol=1e-3)

    def test_penultimate_hidden_state(self):
        """SDXL's bigG reads the penultimate layer."""
        cfg = CLIPConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_layers=3, num_heads=4, max_length=16,
            use_final_layer_norm_output=False,
        )
        model = make_hf_model(cfg)
        params = clip_params_from_state_dict(model.state_dict(), cfg)
        ids = np.array([[1, 2, 3, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
        with torch.no_grad():
            out = model(torch.from_numpy(ids), output_hidden_states=True)
        expected = out.hidden_states[-2].numpy()
        hidden, _ = clip_encode(jnp.array(ids), params, cfg)
        assert_allclose(hidden, expected, atol=1e-4, rtol=1e-3)

    def test_clip_skip_matches_hf(self):
        """diffusers clip_skip semantics: hidden_states[-(clip_skip+1)]
        through the final LayerNorm; pooled output unchanged (the tail
        layers still run)."""
        model = make_hf_model(SMALL)
        params = clip_params_from_state_dict(model.state_dict(), SMALL)
        # 999 = the test vocab's EOS/max id so HF first-EOS pooling and our
        # argmax pooling agree (same convention as test_pooled_output_matches)
        ids = np.array([[49, 2, 777, 5, 999, 0, 3, 1] + [0] * 8])
        with torch.no_grad():
            out = model(torch.from_numpy(ids), output_hidden_states=True)
            expected = model.text_model.final_layer_norm(
                out.hidden_states[-2]).numpy()
        hidden, pooled = clip_encode(jnp.array(ids), params, SMALL,
                                     clip_skip=1)
        assert_allclose(hidden, expected, atol=1e-4, rtol=1e-3)
        assert_allclose(pooled, out.pooler_output.numpy(),
                        atol=1e-4, rtol=1e-3)

    def test_clip_skip_composes_with_penultimate(self):
        """On a bigG-style (penultimate-default) encoder, clip_skip=1 reads
        one layer further back: hidden_states[-3], un-normed."""
        cfg = CLIPConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_layers=3, num_heads=4, max_length=16,
            use_final_layer_norm_output=False,
        )
        model = make_hf_model(cfg)
        params = clip_params_from_state_dict(model.state_dict(), cfg)
        ids = np.array([[1, 2, 3, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
        with torch.no_grad():
            out = model(torch.from_numpy(ids), output_hidden_states=True)
        hidden, _ = clip_encode(jnp.array(ids), params, cfg, clip_skip=1)
        assert_allclose(hidden, out.hidden_states[-3].numpy(),
                        atol=1e-4, rtol=1e-3)

    def test_clip_skip_out_of_range_raises(self):
        params = init_clip(0, SMALL)
        ids = jnp.ones((1, SMALL.max_length), dtype=jnp.int32)
        with pytest.raises(ValueError, match="clip_skip"):
            clip_encode(ids, params, SMALL, clip_skip=SMALL.num_layers)

    def test_jit_and_batch(self):
        params = init_clip(0, SMALL)
        ids = jnp.ones((4, SMALL.max_length), dtype=jnp.int32)
        fn = jax.jit(lambda p, i: clip_encode(i, p, SMALL)[0])
        out = fn(params, ids)
        assert out.shape == (4, SMALL.max_length, SMALL.hidden_size)
        assert np.isfinite(np.asarray(out)).all()


class TestTextProjection:
    def test_projection_mapping_matches_hf(self):
        """SDXL's CLIPTextModelWithProjection: pooled output through the
        text_projection matrix."""
        import torch
        from transformers import CLIPTextConfig, CLIPTextModelWithProjection

        cfg = CLIPConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, max_length=16,
            use_final_layer_norm_output=False, projection_dim=32,
        )
        hf_cfg = CLIPTextConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
            max_position_embeddings=cfg.max_length, hidden_act="quick_gelu",
            projection_dim=32, eos_token_id=999,
        )
        torch.manual_seed(1)
        model = CLIPTextModelWithProjection(hf_cfg).eval()
        params = clip_params_from_state_dict(model.state_dict(), cfg)
        ids = np.array([[5, 7, 999, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
        with torch.no_grad():
            expected = model(torch.from_numpy(ids)).text_embeds.numpy()
        _, pooled = clip_encode(jnp.array(ids), params, cfg)
        assert_allclose(pooled, expected, atol=1e-4, rtol=1e-3)
