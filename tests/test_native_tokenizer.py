"""Native (C++) tokenizer vs the Python oracle, token-for-token.

The Python implementation is itself verified against HF transformers
(test_tokenizer.py), so transitively native == HF on ASCII input.
"""

import numpy as np
import pytest

from sdtpu.tokenizer.native import NativeCLIPTokenizer

from test_tokenizer import PROMPTS, build_assets


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    vocab, merges = build_assets(tmp_path_factory.mktemp("ntok"))
    t = NativeCLIPTokenizer(vocab, merges)
    if not t.native_available:
        pytest.skip("native library unavailable (no g++?)")
    return t


class TestNativeVsPython:
    @pytest.mark.parametrize("prompt", [p for p in PROMPTS if p.isascii()])
    def test_ids_match_python(self, tok, prompt):
        native = tok.encode(prompt, max_length=77)
        python = tok.fallback.encode(prompt, max_length=77)
        assert native == python, prompt

    def test_random_ascii_fuzz(self, tok):
        rng = np.random.default_rng(0)
        chars = list(
            "abcdefghijklmnopqrstuvwxyzABCDEFGHIJ 0123456789.,!?'\"-_()[]<>&%$#@"
        )
        for _ in range(200):
            n = int(rng.integers(0, 60))
            prompt = "".join(rng.choice(chars, n))
            assert tok.encode(prompt) == tok.fallback.encode(prompt), repr(prompt)

    def test_truncation_matches(self, tok):
        prompt = "hello world " * 60
        assert tok.encode(prompt, max_length=77) == tok.fallback.encode(
            prompt, max_length=77
        )

    def test_non_ascii_falls_back(self, tok):
        prompt = "a caté ünïcode prompt"
        assert tok.encode(prompt) == tok.fallback.encode(prompt)

    def test_special_ids(self, tok):
        assert tok.bos_id == tok.fallback.bos_id
        assert tok.eos_id == tok.fallback.eos_id
