"""Long prompts (> one CLIP window) via chunked encoding — the community
"long prompt" scheme: body tokens split into (window-2)-token chunks, each
wrapped BOS..EOS and encoded independently (own position embeddings), hidden
states concatenated into an n*77-token cross-attention context.

Beyond-reference capability (the reference truncates at 77,
``clip.mojo:90-92``); cross-attention consumes any context length natively.
"""

import dataclasses

import jax
import numpy as np
import pytest

from sdtpu.models.clip import clip_encode, clip_encode_windows, init_clip
from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from sdtpu.tokenizer.bpe import CLIPTokenizer

from conftest import assert_allclose
from test_pipeline import TINY
from test_tokenizer import build_assets

W = 16  # test window (the real one is 77; the scheme is size-generic)


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    return CLIPTokenizer.from_files(
        *build_assets(tmp_path_factory.mktemp("lptok"))
    )


@pytest.fixture(scope="module")
def tok_pipe(tok):
    cfg = TINY.replace(
        clip=dataclasses.replace(TINY.clip, vocab_size=1024, max_length=W)
    )
    return StableDiffusionPipeline.from_random(cfg, seed=0, tokenizer=tok)


LONG = "hello world the quick brown fox jumps over a lazy dog again and again"
SHORT = "hello world"


class TestTokenizerChunking:
    def test_short_prompt_matches_encode(self, tok):
        assert tok.encode_long(SHORT, window=W) == tok.encode(
            SHORT, max_length=W
        )
        assert tok.num_windows(SHORT, window=W) == 1

    def test_long_prompt_chunks(self, tok):
        ids = tok.encode_long(LONG, window=W)
        n = tok.num_windows(LONG, window=W)
        assert n > 1 and len(ids) == n * W
        body = tok._encode_body(LONG)
        rebuilt = []
        for k in range(n):
            win = ids[k * W: (k + 1) * W]
            assert win[0] == tok.bos_id
            assert tok.eos_id in win[1:]
            e = win.index(tok.eos_id)
            assert all(t == tok.eos_id for t in win[e:])  # EOS padding
            rebuilt += win[1:e]
        assert rebuilt == body  # no token lost or duplicated across windows

    def test_num_windows_forced_pads_and_truncates(self, tok):
        n = tok.num_windows(LONG, window=W)
        padded = tok.encode_long(LONG, window=W, num_windows=n + 2)
        assert len(padded) == (n + 2) * W
        empty = padded[-W:]
        assert empty[0] == tok.bos_id
        assert all(t == tok.eos_id for t in empty[1:])  # uncond-row window
        truncated = tok.encode_long(LONG, window=W, num_windows=1)
        assert len(truncated) == W
        assert truncated[: W - 1] == tok.encode(LONG, max_length=W)[: W - 1]

    def test_weighted_long_alignment(self, tok):
        ids, weights = tok.encode_weighted_long(
            "hello (world:1.5) " + LONG, window=W
        )
        assert len(ids) == len(weights)
        assert len(ids) % W == 0
        assert 1.5 in weights
        # BOS/EOS/pad positions weigh 1.0
        for k in range(len(ids) // W):
            assert weights[k * W] == 1.0
        # unweighted text -> all ones, ids match encode_long
        ids_u, w_u = tok.encode_weighted_long(LONG, window=W)
        assert set(w_u) == {1.0}
        assert ids_u == tok.encode_long(LONG, window=W)


class TestClipWindows:
    def test_matches_per_window_encoding(self, tok):
        """(B, 2W) chunked encode == two independent clip_encode calls per
        row, concatenated — pins the reshape's row/window layout."""
        cfg = dataclasses.replace(
            TINY.clip, vocab_size=1024, max_length=W
        )
        params = init_clip(0, cfg)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 1000, (2, 2 * W)).astype(np.int32)
        hidden, pooled = clip_encode_windows(ids, params, cfg)
        assert hidden.shape == (2, 2 * W, cfg.hidden_size)
        for b in range(2):
            for k in range(2):
                h_ref, p_ref = clip_encode(
                    ids[b, k * W: (k + 1) * W][None], params, cfg
                )
                assert_allclose(
                    hidden[b, k * W: (k + 1) * W], h_ref[0],
                    atol=1e-5, rtol=1e-5,
                )
                if k == 0:  # pooled = FIRST window's
                    assert_allclose(pooled[b], p_ref[0], atol=1e-5, rtol=1e-5)

    def test_rejects_non_multiple_length(self):
        cfg = dataclasses.replace(TINY.clip, max_length=W)
        params = init_clip(0, cfg)
        with pytest.raises(ValueError, match="multiple of the CLIP window"):
            clip_encode_windows(
                np.ones((1, W + 3), np.int32), params, cfg
            )


class TestPipelineLongPrompts:
    def test_long_prompt_generates(self, tok_pipe):
        img = tok_pipe.generate(LONG, num_inference_steps=2, seed=1)
        assert img.shape == (1, 32, 32, 3)

    def test_short_prompt_unchanged_by_long_path(self, tok_pipe):
        """A one-window prompt must produce the EXACT pre-long-prompt-era
        image (encode_long degenerates to encode)."""
        a = tok_pipe.generate(SHORT, num_inference_steps=2, seed=3)
        ids = np.asarray(
            [tok_pipe.tokenizer.encode(SHORT, max_length=W),
             tok_pipe.tokenizer.encode("", max_length=W)], np.int32
        )
        b = tok_pipe.generate(
            "x", token_ids=ids, num_inference_steps=2, seed=3
        )
        np.testing.assert_array_equal(a, b)

    def test_long_cond_short_neg_align(self, tok_pipe):
        """CFG with a long prompt and short negative: the uncond rows chunk
        to the same window count (shape-aligned concat)."""
        img = tok_pipe.generate(
            LONG, "cat", num_inference_steps=2, seed=1
        )
        assert img.shape == (1, 32, 32, 3)

    def test_truncation_vs_chunking_differ(self, tok_pipe):
        """The tail of a long prompt must actually condition the image
        (truncating it changes the output)."""
        full = tok_pipe.generate(LONG, num_inference_steps=2, seed=1)
        n1 = tok_pipe.tokenizer.encode_long(LONG, window=W, num_windows=1)
        ids = np.asarray([n1], np.int32)
        truncated = tok_pipe.generate(
            "x", token_ids=ids, num_inference_steps=2, seed=1
        )
        assert np.abs(
            full.astype(np.int32) - truncated.astype(np.int32)
        ).max() > 0

    def test_batch_mixed_lengths_pad_to_max(self, tok_pipe):
        imgs = tok_pipe.generate_batch(
            [LONG, SHORT], num_inference_steps=2, seeds=[1, 2]
        )
        assert imgs.shape == (2, 32, 32, 3)

    def test_weighted_long_prompt(self, tok_pipe):
        img = tok_pipe.generate(
            "(hello:1.3) " + LONG, num_inference_steps=2, seed=1,
            prompt_weighting=True,
        )
        assert img.shape == (1, 32, 32, 3)


class TestServingLongPrompts:
    def test_window_counts_do_not_coalesce(self, tok_pipe):
        """A long and a short request must NOT share a batch: the short
        row would otherwise gain padded empty windows, making its image
        depend on batch composition.  Each must match its solo image."""
        from sdtpu.pipeline.serving import ServingEngine

        solo_long = tok_pipe.generate_batch(
            [LONG], num_inference_steps=2, seeds=[7]
        )
        solo_short = tok_pipe.generate_batch(
            [SHORT], num_inference_steps=2, seeds=[8]
        )
        engine = ServingEngine(tok_pipe, max_batch_size=2, max_wait_ms=50)
        try:
            fa = engine.submit(LONG, seed=7, num_inference_steps=2,
                               image_size=32)
            fb = engine.submit(SHORT, seed=8, num_inference_steps=2,
                               image_size=32)
            a, b = fa.result(300), fb.result(300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        np.testing.assert_array_equal(a, solo_long[0])
        np.testing.assert_array_equal(b, solo_short[0])
        assert stats["batches"] == 2  # different window buckets
