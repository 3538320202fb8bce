"""Pipeline + real tokenizer integration: the full host path
(text -> BPE ids -> compiled program) without pre-tokenized ids."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from sdtpu.tokenizer.bpe import CLIPTokenizer

from test_pipeline import TINY
from test_tokenizer import build_assets


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    vocab_file, merges_file = build_assets(tmp_path_factory.mktemp("ptok"))
    tok = CLIPTokenizer.from_files(vocab_file, merges_file)
    # tokenizer vocab (~600 ids) must fit the test CLIP's embedding table
    cfg = TINY.replace(
        clip=dataclasses.replace(TINY.clip, vocab_size=1024, max_length=16)
    )
    return StableDiffusionPipeline.from_random(cfg, seed=0, tokenizer=tok)


class TestTokenizerIntegration:
    def test_prompt_to_image(self, pipe):
        img = pipe.generate("a cat flying a spaceship",
                            num_inference_steps=2, seed=40)
        assert img.shape == (1, 32, 32, 3)

    def test_negative_prompt_changes_output(self, pipe):
        a = pipe.generate("hello world", "", num_inference_steps=2, seed=1)
        b = pipe.generate("hello world", "cat dog", num_inference_steps=2, seed=1)
        assert (a != b).any()

    def test_same_prompt_same_image(self, pipe):
        a = pipe.generate("hello world", num_inference_steps=2, seed=3)
        b = pipe.generate("hello world", num_inference_steps=2, seed=3)
        np.testing.assert_array_equal(a, b)

    def test_batch_prompts_without_token_ids(self, pipe):
        imgs = pipe.generate_batch(
            ["hello world", "cat"], num_inference_steps=2, seeds=[1, 2]
        )
        assert imgs.shape == (2, 32, 32, 3)
