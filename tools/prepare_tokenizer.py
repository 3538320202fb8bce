#!/usr/bin/env python3
"""Offline tokenizer-asset prep (analogue of the reference's
``tokenizer_creation.py``, which repacks the HF CLIP vocab into a llama2.c
binary).  We keep the canonical vocab.json + merges.txt instead — no lossy
repacking — written to ``assets/tokenizer/``.

Requires network (or a populated HF cache); run once, commit/ship the assets.

Usage:
    python tools/prepare_tokenizer.py [--model openai/clip-vit-large-patch14]
                                      [--out assets/tokenizer]
"""

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="openai/clip-vit-large-patch14")
    ap.add_argument("--out", default="assets/tokenizer")
    args = ap.parse_args()

    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(args.model)
    os.makedirs(args.out, exist_ok=True)
    tok.save_vocabulary(args.out)
    print(f"wrote {sorted(os.listdir(args.out))} to {args.out}")


if __name__ == "__main__":
    main()
