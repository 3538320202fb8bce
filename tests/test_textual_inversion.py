"""Textual-inversion embedding loading (sdtpu/utils/textual_inversion.py)
and the tokenizer placeholder path (bpe.py:add_placeholder)."""

import numpy as np
import pytest

from conftest import assert_allclose
from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from sdtpu.tokenizer.bpe import CLIPTokenizer
from sdtpu.utils.textual_inversion import apply_textual_inversion

from test_pipeline import TINY, TOKENS
from test_tokenizer import build_assets


@pytest.fixture(scope="module")
def pipe():
    # private instance — these tests grow its embedding table
    return StableDiffusionPipeline.from_random(TINY, seed=5)


class TestApply:
    def test_diffusers_layout_appends_rows(self, pipe, rng):
        emb = rng.standard_normal((2, 32)).astype(np.float32)
        new, reg = apply_textual_inversion(pipe.params, {"<thing>": emb})
        assert reg == {"<thing>": [512, 513]}
        table = np.asarray(new["clip"]["token_embedding"]["weight"])
        assert table.shape == (514, 32)
        assert_allclose(table[512:], emb, rtol=1e-6, atol=1e-6)
        # base rows and input tree untouched
        base = np.asarray(pipe.params["clip"]["token_embedding"]["weight"])
        assert base.shape == (512, 32)
        assert np.array_equal(table[:512], base)

    def test_emb_params_layout_needs_token(self, pipe, rng):
        emb = rng.standard_normal((1, 32)).astype(np.float32)
        with pytest.raises(ValueError, match="token"):
            apply_textual_inversion(pipe.params, {"emb_params": emb})
        new, reg = apply_textual_inversion(
            pipe.params, {"emb_params": emb}, token="<x>")
        assert reg == {"<x>": [512]}
        got = np.asarray(new["clip"]["token_embedding"]["weight"])[512]
        assert_allclose(got, emb[0], rtol=1e-6, atol=1e-6)

    def test_1d_vector_promotes(self, pipe, rng):
        emb = rng.standard_normal((32,)).astype(np.float32)
        _, reg = apply_textual_inversion(pipe.params, {"<v>": emb})
        assert reg == {"<v>": [512]}

    def test_dual_encoder_on_single_encoder_raises(self, pipe, rng):
        sd = {"clip_l": rng.standard_normal((1, 32)).astype(np.float32),
              "clip_g": rng.standard_normal((1, 32)).astype(np.float32)}
        with pytest.raises(ValueError, match="token"):
            apply_textual_inversion(pipe.params, sd)
        with pytest.raises(ValueError, match="one text encoder"):
            apply_textual_inversion(pipe.params, sd, token="<x>")

    def test_wrong_dim_raises(self, pipe, rng):
        with pytest.raises(ValueError, match="dim"):
            apply_textual_inversion(
                pipe.params,
                {"<bad>": rng.standard_normal((1, 48)).astype(np.float32)})


class TestTokenizerPlaceholder:
    def test_encode_splices_ids(self, tmp_path):
        tok = CLIPTokenizer.from_files(*build_assets(tmp_path))
        base = tok.encode("a cat", max_length=16)
        tok.add_placeholder("<thing>", [901, 902])
        ids = tok.encode("a <Thing> cat", max_length=16)
        # bos, 'a', 901, 902, 'cat', eos...  (case-insensitive match)
        assert ids[2:4] == [901, 902]
        assert ids[1] == base[1]
        assert ids[4] == base[2]
        # text without the placeholder is unchanged
        assert tok.encode("a cat", max_length=16) == base


class TestPipelineApi:
    def test_load_and_generate_with_new_ids(self, pipe, rng):
        emb = rng.standard_normal((2, 32)).astype(np.float32)
        reg = pipe.load_textual_inversion({"<thing>": emb})
        assert reg == {"<thing>": [512, 513]}
        toks = TOKENS[:1].copy()
        toks[0, 2:4] = [512, 513]
        img = pipe.generate("x", token_ids=toks, num_inference_steps=2,
                            seed=7)
        assert img.shape == (1, 32, 32, 3)
        # the concept ids change the image vs the base ids
        base = pipe.generate("x", token_ids=TOKENS[:1],
                             num_inference_steps=2, seed=7)
        assert not np.array_equal(img, base)
