"""Weighted prompts: the (word:1.3) emphasis syntax
(sdtpu/utils/prompt_weighting.py) through the tokenizer and pipeline."""

import numpy as np
import pytest

from sdtpu.tokenizer.bpe import CLIPTokenizer
from sdtpu.utils.prompt_weighting import parse_prompt_attention

from test_pipeline import TOKENS
from test_tokenizer import build_assets

from conftest import assert_images_match


class TestParser:
    def test_plain_text(self):
        assert parse_prompt_attention("a cat") == [("a cat", 1.0)]

    def test_explicit_weight(self):
        assert parse_prompt_attention("a (cat:1.5) dog") == [
            ("a ", 1.0), ("cat", 1.5), (" dog", 1.0)]

    def test_emphasis_nesting_multiplies(self):
        out = parse_prompt_attention("((cat))")
        assert len(out) == 1
        assert out[0][0] == "cat"
        assert out[0][1] == pytest.approx(1.1 * 1.1)

    def test_square_deemphasis(self):
        out = parse_prompt_attention("[cat]")
        assert out[0][1] == pytest.approx(1 / 1.1)

    def test_mixed_and_merge(self):
        out = parse_prompt_attention("a (b) (c) d")
        # "(b) (c)": equal weights but separated by the 1.0 space
        assert [w for _, w in out] == pytest.approx([1.0, 1.1, 1.0, 1.1, 1.0])

    def test_escaped_brackets_literal(self):
        assert parse_prompt_attention(r"a \(cat\)") == [("a (cat)", 1.0)]

    def test_unbalanced_open_applies_at_end(self):
        out = parse_prompt_attention("a (cat")
        assert out == [("a ", 1.0), ("cat", pytest.approx(1.1))]

    def test_explicit_weight_inside_nesting(self):
        out = parse_prompt_attention("((flowers:1.2))")
        assert out[0][1] == pytest.approx(1.2 * 1.1)

    def test_stray_close_is_literal(self):
        assert parse_prompt_attention("a) b]") == [("a) b]", 1.0)]


class TestEncodeWeighted:
    def test_ids_match_plain_encode_weights_cover_fragments(self, tmp_path):
        tok = CLIPTokenizer.from_files(*build_assets(tmp_path))
        plain = tok.encode("a cat flying", max_length=16)
        ids, ws = tok.encode_weighted("a (cat:2.0) flying", max_length=16)
        assert ids == plain
        assert len(ws) == len(ids)
        assert ws[0] == 1.0  # BOS
        # exactly the 'cat' token carries 2.0
        cat_ids = [i for i, w in zip(ids, ws) if w == 2.0]
        assert cat_ids == tok.encode("cat", max_length=None, pad=False)[1:-1]
        assert ws[-1] == 1.0  # EOS padding

    def test_placeholder_composes(self, tmp_path):
        tok = CLIPTokenizer.from_files(*build_assets(tmp_path))
        tok.add_placeholder("<x>", [901, 902])
        ids, ws = tok.encode_weighted("(<x>:1.5) cat", max_length=16)
        assert ids[1:3] == [901, 902]
        assert ws[1:3] == [1.5, 1.5]


class TestPipelineTokenWeights:
    def test_unit_weights_reproduce_base_and_emphasis_differs(self, tiny_pipe):
        pipe = tiny_pipe
        base = pipe.generate("x", token_ids=TOKENS, num_inference_steps=2,
                             seed=3)
        ones = pipe.generate("x", token_ids=TOKENS, num_inference_steps=2,
                             seed=3, token_weights=np.ones(TOKENS.shape))
        # w == 1 everywhere: scale and renorm are both exact identities
        assert_images_match(ones, base)

        w = np.ones(TOKENS.shape, np.float32)
        w[0, 1] = 1.8
        emph = pipe.generate("x", token_ids=TOKENS, num_inference_steps=2,
                             seed=3, token_weights=w)
        assert not np.array_equal(emph, base)

    def test_token_weights_without_ids_raises(self, tiny_pipe):
        with pytest.raises(ValueError, match="token_ids"):
            tiny_pipe.generate("x", num_inference_steps=2,
                               token_weights=np.ones((1, 16)))

    def test_prompt_weighting_end_to_end(self, tmp_path):
        """Full prompt_weighting=True path with a real (test-vocab)
        tokenizer: explicit :1.0 weights are a bitwise identity, real
        emphasis changes the image.  Needs a vocab >= the test
        tokenizer's id range (TINY's 512 is too small — out-of-range ids
        NaN the embedding lookup via jnp.take's fill mode)."""
        import dataclasses

        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        from test_pipeline import TINY

        cfg = dataclasses.replace(
            TINY, clip=dataclasses.replace(TINY.clip, vocab_size=1024))
        pipe = StableDiffusionPipeline.from_random(cfg, seed=0)
        pipe.tokenizer = CLIPTokenizer.from_files(*build_assets(tmp_path))
        base = pipe.generate("a cat flying", num_inference_steps=2, seed=7)
        assert base.min() < base.max()  # finite, non-constant
        neutral = pipe.generate("a (cat:1.0) flying", num_inference_steps=2,
                                seed=7, prompt_weighting=True)
        assert_images_match(neutral, base)
        emph = pipe.generate("a (cat:1.6) flying", num_inference_steps=2,
                             seed=7, prompt_weighting=True)
        assert not np.array_equal(emph, base)

    def test_prompt_weighting_without_tokenizer_raises(self, tiny_pipe):
        if tiny_pipe.tokenizer is not None:
            pytest.skip("tokenizer present")
        with pytest.raises(ValueError, match="tokenizer"):
            tiny_pipe.generate("a (cat:1.5)", num_inference_steps=2,
                               prompt_weighting=True)


IDS = np.array([1, 5, 9, 2] + [0] * 12)


class TestBatchTokenWeights:
    def test_batch_rows_match_single_request_generate(self, tiny_pipe):
        """generate_batch token_weights: each weighted row must equal the
        same request run solo through generate (per-request RNG)."""
        pipe = tiny_pipe
        w1 = np.ones(16, np.float32)
        w2 = np.ones(16, np.float32)
        w2[2] = 1.7
        batch = pipe.generate_batch(
            ["a", "b"], token_ids=np.stack([IDS, IDS]),
            token_weights=np.stack([w1, w2]),
            num_inference_steps=2, seeds=[11, 12])
        # solo references (the (2B,L) ids row layout in generate is
        # [cond, uncond]; its token_weights covers the leading rows)
        solo2 = pipe.generate_batch(
            ["b"], token_ids=IDS[None], token_weights=w2[None],
            num_inference_steps=2, seeds=[12])
        assert_images_match(batch[1], solo2[0])
        # unit-weight row == unweighted program's row (renorm exactness)
        plain = pipe.generate_batch(
            ["a"], token_ids=IDS[None], num_inference_steps=2, seeds=[11])
        assert_images_match(batch[0], plain[0])

    def test_batch_weight_shape_mismatch_raises(self, tiny_pipe):
        with pytest.raises(ValueError, match="must match"):
            tiny_pipe.generate_batch(
                ["a"], token_ids=IDS[None],
                token_weights=np.ones((1, 8), np.float32),
                num_inference_steps=1, seeds=[1])

    def test_num_images_with_token_weights(self, tiny_pipe):
        """num_images > 1 delegates to generate_batch with the weights
        tiled per image; row 0 must equal the single-image call."""
        w = np.ones(16, np.float32)
        w[2] = 1.4
        # reference = the same per-request-RNG program num_images delegates
        # to (generate() solo uses the scalar split-key scheme instead, so
        # it is NOT comparable row-for-row)
        single = tiny_pipe.generate_batch(
            ["x"], token_ids=IDS[None], token_weights=w[None],
            num_inference_steps=2, seeds=[5])
        multi = tiny_pipe.generate("x", token_ids=IDS[None],
                                   token_weights=w[None],
                                   num_inference_steps=2, seed=5,
                                   num_images=2)
        assert multi.shape[0] == 2
        # batch-1 program vs batch-2 program: +-1-level scope (renorm
        # ratio low bits are batch-shape-dependent)
        diff = np.abs(multi[0].astype(int) - single[0].astype(int))
        assert diff.max() <= 1
        assert (diff != 0).mean() <= 0.005

    def test_batch_weights_without_ids_raises(self, tiny_pipe):
        with pytest.raises(ValueError, match="token_ids"):
            tiny_pipe.generate_batch(
                ["a"], token_weights=np.ones((1, 16), np.float32),
                num_inference_steps=1, seeds=[1])


class TestServingWeighted:
    def test_weighted_requests_coalesce_and_match_solo(self, tiny_pipe):
        from sdtpu.pipeline.serving import ServingEngine

        w = np.ones(16, np.float32)
        w[3] = 1.5
        solo = tiny_pipe.generate_batch(
            ["p"], token_ids=IDS[None], token_weights=w[None],
            num_inference_steps=2, seeds=[21])
        engine = ServingEngine(tiny_pipe, max_batch_size=4, max_wait_ms=50)
        try:
            f1 = engine.submit("p", token_ids=IDS, token_weights=w, seed=21,
                               num_inference_steps=2, image_size=32)
            f2 = engine.submit("p", token_ids=IDS, token_weights=np.ones(16),
                               seed=22, num_inference_steps=2, image_size=32)
            a, b = f1.result(300), f2.result(300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        # solo vs coalesced: the renorm ratio's reduction is compiled per
        # batch shape, so its low bits can differ -> at most the engine's
        # documented +-1 uint8 level on a small fraction of pixels (the
        # unweighted rows stay bitwise at CPU test dims)
        diff = np.abs(a.astype(int) - solo[0].astype(int))
        assert diff.max() <= 1
        assert (diff != 0).mean() <= 0.005
        assert not np.array_equal(a, b)
        # both weighted rows share the "tw" bucket -> one batch
        assert stats["batches"] == 1

    def test_weighted_and_unweighted_bucket_separately(self, tiny_pipe):
        from sdtpu.pipeline.serving import ServingEngine

        engine = ServingEngine(tiny_pipe, max_batch_size=4, max_wait_ms=30)
        try:
            f1 = engine.submit("p", token_ids=IDS, seed=5,
                               num_inference_steps=2, image_size=32)
            f2 = engine.submit("p", token_ids=IDS,
                               token_weights=np.ones(16, np.float32),
                               seed=5, num_inference_steps=2, image_size=32)
            a, b = f1.result(300), f2.result(300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert stats["batches"] == 2  # different compiled programs
        # unit weights: identical math across the two programs
        assert_images_match(a, b)
