#!/usr/bin/env python3
"""On-chip bitwise batch-invariance check (VERDICT.md round-2 item 1a).

The serving engine guarantees a request's image is IDENTICAL whether it ran
solo or coalesced into a batch (per-request RNG + per-row uncond make the
math row-independent; what remains is the backend's numerics).  Round 2's
LayerNorm-stats-as-matmul was reverted because the CPU lowering's
accumulation order varied with the row count and broke this guarantee by
1 uint8 level.  The TPU MXU's per-row contraction order is row-count-
independent by construction — but that claim ships only with this check
green on the real chip (run it whenever an op's stats/accumulation strategy
changes):

    python tools/check_batch_invariance.py [--preset tiny-sd] [--steps 4]
        [--batch 8] [--image-size 512] [--sampler euler] [--rows 0 3 7]

Builds the preset at full architecture with host-seeded random weights
(values matter: zeros would degenerate the numerics under test), runs one
coalesced generate_batch and per-row solo runs with the same per-request
seeds, and compares uint8 images bitwise.  Prints one JSON line;
exit 0 = bitwise identical.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny-sd")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--sampler", default="euler")
    ap.add_argument("--rows", type=int, nargs="*", default=[0, 3, 7],
                    help="which batch rows to re-run solo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdtpu.config import get_preset
    from sdtpu.pipeline.pipeline import StableDiffusionPipeline
    from sdtpu.utils.runtime import enable_compilation_cache
    from sdtpu.utils.weights import init_pipeline_params

    enable_compilation_cache()
    config = get_preset(args.preset)

    # host-side random weights at the real architecture: fast (numpy) and
    # numerically representative, unlike zeros
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, config), jax.random.key(0)
    )
    host_rng = np.random.default_rng(1234)

    def make(s):
        return jnp.asarray(
            host_rng.standard_normal(s.shape, dtype=np.float32).astype(
                jax.dtypes.canonicalize_dtype(s.dtype)
            ) * 0.04
        )

    params = jax.tree.map(make, shapes)
    pipe = StableDiffusionPipeline(config, params)
    print(f"params in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(7)
    ids = rng.integers(
        1, config.clip.vocab_size, (args.batch, config.clip.max_length)
    )
    seeds = list(range(100, 100 + args.batch))
    kw = dict(num_inference_steps=args.steps, image_size=args.image_size,
              sampler=args.sampler, cfg=True)

    t0 = time.perf_counter()
    coalesced = pipe.generate_batch(
        ["bench"] * args.batch, token_ids=ids, seeds=seeds, **kw
    )
    print(f"coalesced batch in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    mismatches = []
    for r in args.rows:
        solo = pipe.generate_batch(
            ["bench"], token_ids=ids[r : r + 1], seeds=[seeds[r]], **kw
        )
        diff = int(np.sum(solo[0] != coalesced[r]))
        worst = int(
            np.max(np.abs(solo[0].astype(np.int32)
                          - coalesced[r].astype(np.int32)))
        )
        mismatches.append({"row": r, "mismatched_pixels": diff,
                           "max_level_diff": worst})
        print(f"row {r}: {diff} mismatched uint8 values "
              f"(max level diff {worst})", file=sys.stderr)

    ok = all(m["mismatched_pixels"] == 0 for m in mismatches)
    print(json.dumps({
        "check": "serving bitwise batch-invariance (solo == coalesced)",
        "preset": args.preset,
        "steps": args.steps, "batch": args.batch, "size": args.image_size,
        "sampler": args.sampler,
        "backend": jax.default_backend(),
        "rows": mismatches,
        "bitwise_identical": ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
