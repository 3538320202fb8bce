#!/usr/bin/env python3
"""Same-process A/B of quantization variants on one workload.

Cross-process bench runs disagree by up to 20% on few-step workloads
(relay drift + compile-cache state), so this measures every variant in ONE
process with the same pipelined-stream timing as bench.py: bf16 baseline,
then progressively quantized copies (int8 convs / +transformer / +vae).
Each variant gets its own pipeline instance sharing nothing mutable; param
trees are device-committed (the round-3 host-leaf pathology) and freed
after measuring (HBM: three full trees OOM a v5e — CLAUDE.md).

Usage:
    python tools/ab_quant.py [--preset lcm-sd15] [--steps N] [--sampler S]
        [--no-cfg|--cfg] [--image-size 512] [--repeats 8]
        [--variants bf16 int8 int8+vae int8+t ...]

Variant grammar: "bf16" or "int8[+t|+tfull][+vae]" or "vae" (int8 VAE only).
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="lcm-sd15")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--sampler", default=None)
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--no-cfg", action="store_true")
    ap.add_argument("--cfg", action="store_true")
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--variants", nargs="*",
                    default=["bf16", "int8", "int8+vae"])
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
    cfg = (True if args.cfg else
           False if args.no_cfg else config.default_cfg)
    size = args.image_size or config.default_image_size

    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, config), jax.random.key(0)
    )
    base_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    rng = np.random.default_rng(40)
    ids = rng.integers(1, config.text_config.vocab_size,
                       (1, config.text_config.max_length))
    print(f"[{jax.devices()[0]}] {args.preset} {size}px {steps}-step "
          f"{sampler} cfg={cfg}", file=sys.stderr)

    results = {"preset": args.preset, "steps": steps, "size": size,
               "sampler": sampler, "cfg": cfg}
    for variant in args.variants:
        pipe = StableDiffusionPipeline(config, base_params)
        if variant != "bf16":
            flags = set(variant.split("+"))
            transformer = ("full" if "tfull" in flags
                           else "t" in flags)
            quant_unet = "int8" in flags
            vae = "vae" in flags
            if quant_unet:
                pipe.quantize_int8(transformer=transformer, vae=vae)
            elif vae:
                # VAE-decoder-only (no public unet=False knob)
                from sdtpu.utils.quant import quantize_vae_decoder_int8

                newp = dict(pipe.params)
                newp["vae_decoder"] = quantize_vae_decoder_int8(
                    newp["vae_decoder"])
                pipe.params = jax.tree.map(jnp.asarray, newp)

        def run(seed):
            return pipe.generate_batch(
                ["ab"], token_ids=ids, num_inference_steps=steps,
                image_size=size, sampler=sampler, cfg=cfg, seeds=[seed],
                output="device",
            )

        t0 = time.perf_counter()
        np.asarray(run(0))
        compile_s = time.perf_counter() - t0
        marks = []
        pending = run(100)
        for i in range(args.repeats):
            nxt = run(200 + 100 * i)
            np.asarray(pending)
            marks.append(time.perf_counter())
            pending = nxt
        np.asarray(pending)
        gaps = [y - x for x, y in zip(marks, marks[1:])]
        p50 = statistics.median(gaps)
        results[variant] = {"p50_s": round(p50, 4),
                            "images_per_sec": round(1.0 / p50, 3)}
        print(f"{variant:12s} p50 {p50 * 1000:7.1f} ms "
              f"({1.0 / p50:6.3f} img/s)  compile+first {compile_s:.1f}s",
              file=sys.stderr)
        del pipe  # free the quantized tree before building the next

    print(json.dumps(results))


if __name__ == "__main__":
    main()
