"""Tokenizer tests: token-for-token parity with HF transformers'
CLIPTokenizer on a synthetic vocab (SURVEY.md §4: "tokenizer ids vs HF
CLIPTokenizer") — the real 49408-token assets are prepared offline by
``tools/prepare_tokenizer.py`` with identical file formats.
"""

import json

import numpy as np
import pytest

from sdtpu.tokenizer.bpe import BOS_TOKEN, EOS_TOKEN, CLIPTokenizer, bytes_to_unicode

WORDS = ["hello", "world", "cat", "flying", "a", "spaceship", "the", "dog"]


def build_assets(tmp_path):
    """Synthetic vocab/merges in the real CLIP file format: all byte symbols
    (+</w> forms) as base tokens, then merges building up common words."""
    tmp_path.mkdir(parents=True, exist_ok=True)  # callers pass fresh subdirs
    vocab = {}
    for c in bytes_to_unicode().values():
        vocab[c] = len(vocab)
    for c in bytes_to_unicode().values():
        vocab[c + "</w>"] = len(vocab)
    merges = []
    seen = set()
    for w in WORDS:
        pieces = list(w[:-1]) + [w[-1] + "</w>"]
        while len(pieces) > 1:
            pair = (pieces[0], pieces[1])
            if pair not in seen:
                seen.add(pair)
                merges.append(pair)
            merged = pieces[0] + pieces[1]
            if merged not in vocab:
                vocab[merged] = len(vocab)
            pieces = [merged] + pieces[2:]
    vocab[BOS_TOKEN] = len(vocab)
    vocab[EOS_TOKEN] = len(vocab)

    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(vocab))
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return str(vocab_file), str(merges_file)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    return build_assets(tmp_path_factory.mktemp("tok"))


@pytest.fixture(scope="module")
def ours(assets):
    return CLIPTokenizer.from_files(*assets)


@pytest.fixture(scope="module")
def hf(assets):
    from transformers import CLIPTokenizer as HFTok

    return HFTok(vocab_file=assets[0], merges_file=assets[1])


PROMPTS = [
    "a cat flying a spaceship",
    "hello world",
    "HELLO WoRLD",  # lowercasing
    "the   dog,  flying!!",  # whitespace cleanup + punctuation runs
    "cat's hello'll world",  # contraction suffixes
    "unknownword zzz",  # falls back to char-level merges
    "42 cats & 7 dogs _mixed_ <tags>",
    "  leading and trailing   ",
    "",
]


class TestVsTransformers:
    @pytest.mark.parametrize("prompt", PROMPTS)
    def test_ids_match(self, ours, hf, prompt):
        expected = hf(
            prompt, padding="max_length", max_length=77, truncation=True
        )["input_ids"]
        got = ours.encode(prompt, max_length=77)
        assert got == expected, f"{prompt!r}: {got[:12]} != {expected[:12]}"

    def test_truncation(self, ours, hf):
        prompt = " ".join(["hello"] * 100)
        expected = hf(
            prompt, padding="max_length", max_length=77, truncation=True
        )["input_ids"]
        got = ours.encode(prompt, max_length=77)
        assert len(got) == 77
        assert got == expected
        assert got[-1] == ours.eos_id

    def test_bos_eos_framing(self, ours):
        ids = ours.encode("hello", max_length=77)
        assert ids[0] == ours.bos_id
        assert ids[2] == ours.eos_id  # "hello" is one merged token
        assert all(i == ours.eos_id for i in ids[2:])

    def test_decode_roundtrip(self, ours):
        text = "a cat flying a spaceship"
        ids = ours.encode(text, max_length=77)
        assert ours.decode(ids) == text

    def test_unpadded(self, ours):
        ids = ours.encode("hello world", max_length=None, pad=False)
        assert ids[0] == ours.bos_id and ids[-1] == ours.eos_id
        assert len(ids) == 4
