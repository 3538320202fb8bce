#!/usr/bin/env python3
"""Capture an XProf trace of the e2e generate program for
tools/summarize_trace.py attribution (the round-3 perf-decision loop:
chained A/Bs of sub-0.3 ms kernels are RTT-drift garbage — kernel and
glue decisions come from traces).

Builds the same workload as bench.py (zeros params — values don't change
timing), warms the program OUTSIDE the trace, then records a short
pipelined stream.

Usage:
    python tools/capture_trace.py [--preset tiny-sd] [--image-size 512]
        [--steps 25] [--sampler ddpm] [--no-cfg] [--int8]
        [--int8-transformer] [--int8-transformer-full] [--int8-vae]
        [--encoder-cache K] [--batch 1] [--repeats 3]
        [--out /tmp/sdtpu_trace]
    python tools/summarize_trace.py /tmp/sdtpu_trace --steps 25
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny-sd")
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--sampler", default=None)
    ap.add_argument("--no-cfg", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int8-transformer", action="store_true")
    ap.add_argument("--int8-transformer-full", action="store_true")
    ap.add_argument("--int8-vae", action="store_true")
    ap.add_argument("--encoder-cache", type=int, default=1)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="/tmp/sdtpu_trace")
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
    steps = args.steps if args.steps is not None else config.default_steps
    sampler = args.sampler or config.default_sampler
    cfg = False if args.no_cfg else config.default_cfg
    size = args.image_size or config.default_image_size

    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, config), jax.random.key(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    pipe = StableDiffusionPipeline(config, params)
    if args.int8 or args.int8_transformer or args.int8_transformer_full:
        transformer = ("full" if args.int8_transformer_full
                       else bool(args.int8_transformer))
        pipe.quantize_int8(transformer=transformer, vae=args.int8_vae)
    elif args.int8_vae:
        pipe.quantize_int8(vae=True)

    rng = np.random.default_rng(40)
    b = args.batch
    ids = rng.integers(1, config.text_config.vocab_size,
                       (b, config.text_config.max_length))

    def run(seed):
        return pipe.generate_batch(
            ["trace"] * b, token_ids=ids, num_inference_steps=steps,
            image_size=size, sampler=sampler, cfg=cfg,
            seeds=[seed + i for i in range(b)], output="device",
            encoder_cache_interval=args.encoder_cache,
        )

    t0 = time.perf_counter()
    np.asarray(run(0))  # compile + warm outside the trace
    print(f"compile+warm {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    jax.profiler.start_trace(args.out)
    pending = run(100)
    for i in range(args.repeats):
        nxt = run(200 + 100 * i)
        np.asarray(pending)
        pending = nxt
    np.asarray(pending)
    jax.profiler.stop_trace()
    print(f"trace written to {args.out} "
          f"({args.repeats + 1} pipelined generations, {steps} steps, "
          f"batch {b}, {sampler}, cfg={cfg})")


if __name__ == "__main__":
    main()
