#!/usr/bin/env python3
"""Generate an NxM grid of samples for qualitative comparison (seeds across
columns, prompts across rows) — the evaluation workflow for real checkpoints.

Usage:
    python tools/generate_grid.py --model-dir /path/to/tiny-sd \
        --prompts "a cat" "a dog" --seeds 0 1 2 3 --steps 25 --out grid.png
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--preset", default="tiny-sd")
    ap.add_argument("--prompts", nargs="+", default=["a cat flying a spaceship"])
    ap.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2, 3])
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--sampler", default="dpm++")
    ap.add_argument("--cfg-scale", type=float, default=7.5)
    ap.add_argument("--out", default="grid.png")
    args = ap.parse_args()

    import numpy as np

    from sdtpu import StableDiffusionPipeline
    from sdtpu.utils.image import save_png
    from sdtpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    if args.model_dir:
        pipe = StableDiffusionPipeline.from_pretrained(
            args.model_dir, preset=args.preset
        )
    else:
        print("no --model-dir: random weights (structured noise output)")
        pipe = StableDiffusionPipeline.from_random(args.preset)

    rows = []
    for prompt in args.prompts:
        token_ids = None
        if pipe.tokenizer is None:
            rng = np.random.default_rng(abs(hash(prompt)) % 2**32)
            token_ids = np.tile(
                rng.integers(0, pipe.config.clip.vocab_size,
                             (1, pipe.config.clip.max_length)),
                (len(args.seeds), 1),
            )
        imgs = pipe.generate_batch(
            [prompt] * len(args.seeds),
            seeds=args.seeds,
            num_inference_steps=args.steps,
            image_size=args.image_size,
            sampler=args.sampler,
            cfg_scale=args.cfg_scale,
            token_ids=token_ids,
        )
        rows.append(np.concatenate(list(imgs), axis=1))  # seeds across cols
    grid = np.concatenate(rows, axis=0)  # prompts down rows
    save_png(grid, args.out)
    print(f"wrote {args.out}: {len(args.prompts)}x{len(args.seeds)} grid "
          f"({grid.shape[1]}x{grid.shape[0]})")


if __name__ == "__main__":
    main()
