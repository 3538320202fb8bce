#!/usr/bin/env python3
"""Same-process serving-vs-single-shot A/B (VERDICT.md round-3 item 3).

Round 3's cross-process readings said the batch-8 engine LOSES to the
pipelined single-shot stream (2.67 vs 3.68 img/s on 25-step tiny-sd).
Cross-session relay drift makes that comparison untrustworthy below ~10%,
so this tool measures everything in ONE process:

  1. raw program efficiency per device batch size: a pipelined stream of
     generate_batch(b, output="device") for b in --batches — per-image gap
     isolates whether big-batch PROGRAMS are less efficient per image;
  2. the ServingEngine at each --engine-batches max_batch_size over
     --requests requests;
  3. a generate_async single-shot loop over the same requests.

Usage:
    python tools/ab_serving.py [--preset tiny-sd] [--steps 25]
        [--image-size 512] [--sampler ddpm] [--requests 32]
        [--batches 1 2 4 8] [--engine-batches 8 2] [--repeats 6]
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny-sd")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--sampler", default="ddpm")
    ap.add_argument("--no-cfg", action="store_true",
                    help="disable CFG (LCM-style guidance-embedding presets)")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--engine-batches", type=int, nargs="*", default=[8, 2])
    ap.add_argument("--repeats", type=int, default=6,
                    help="pipelined stream length per raw batch size")
    ap.add_argument("--device-batch", type=int, default=None,
                    help="engine device_batch_size override to also test")
    args = ap.parse_args()
    args.cfg = not args.no_cfg

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdtpu.config import get_preset
    from sdtpu.pipeline.pipeline import StableDiffusionPipeline
    from sdtpu.pipeline.serving import ServingEngine
    from sdtpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    config = get_preset(args.preset)
    from sdtpu.utils.weights import init_pipeline_params

    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, config), jax.random.key(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    pipe = StableDiffusionPipeline(config, params)
    dev = jax.devices()[0]
    print(f"[{dev}] preset={args.preset} {args.image_size}px "
          f"{args.steps}-step {args.sampler}", file=sys.stderr)

    rng = np.random.default_rng(40)
    max_len = config.text_config.max_length
    results = {"device": str(dev), "preset": args.preset,
               "steps": args.steps, "size": args.image_size}

    # --- 1. raw per-batch-size program efficiency (pipelined stream) -------
    raw = {}
    for b in args.batches:
        ids = rng.integers(1, config.text_config.vocab_size, (b, max_len))

        def run(seed):
            return pipe.generate_batch(
                ["ab"] * b, token_ids=ids, num_inference_steps=args.steps,
                image_size=args.image_size, sampler=args.sampler,
                cfg=args.cfg, seeds=[seed + i for i in range(b)],
                output="device",
            )

        t0 = time.perf_counter()
        np.asarray(run(0))
        print(f"batch {b}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
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
        raw[b] = {"p50_batch_s": round(p50, 4),
                  "per_image_s": round(p50 / b, 4),
                  "images_per_sec": round(b / p50, 3)}
        print(f"batch {b}: p50 {p50*1000:.1f} ms "
              f"({p50/b*1000:.1f} ms/image, {b/p50:.3f} img/s)",
              file=sys.stderr)
    results["raw_program"] = raw

    # --- 2. engine throughput at each max_batch_size ------------------------
    def drive_engine(max_bs, device_bs=None):
        n = args.requests
        ids = rng.integers(1, config.text_config.vocab_size, (n, max_len))
        kw = {}
        if device_bs is not None:
            kw["device_batch_size"] = device_bs
        engine = ServingEngine(pipe, max_batch_size=max_bs,
                               max_wait_ms=5.0, **kw)
        try:
            t0 = time.perf_counter()
            futs = [
                engine.submit(
                    "ab", token_ids=ids[i], seed=i,
                    num_inference_steps=args.steps, sampler=args.sampler,
                    cfg=args.cfg, image_size=args.image_size,
                )
                for i in range(n)
            ]
            for f in futs:
                f.result(timeout=1200)
            wall = time.perf_counter() - t0
            stats = engine.stats()
        finally:
            engine.shutdown()
        out = {"images_per_sec": round(n / wall, 3),
               "wall_s": round(wall, 3),
               "batches": stats["batches"],
               "p50_request_latency_s": round(
                   stats.get("request_latency_p50_s", float("nan")), 3)}
        return out

    engine_res = {}
    for mb in args.engine_batches:
        # warm the bucket first (batch programs already compiled above when
        # mb is in --batches; otherwise this compiles once)
        engine_res[f"engine_b{mb}"] = drive_engine(mb)
        print(f"engine max_batch={mb}: {engine_res[f'engine_b{mb}']}",
              file=sys.stderr)
    if args.device_batch is not None:
        key = f"engine_b{max(args.engine_batches)}_db{args.device_batch}"
        engine_res[key] = drive_engine(
            max(args.engine_batches), device_bs=args.device_batch
        )
        print(f"{key}: {engine_res[key]}", file=sys.stderr)
    results["engine"] = engine_res

    # --- 3. single-shot pipelined generate_async loop -----------------------
    n = args.requests
    ids1 = rng.integers(1, config.text_config.vocab_size,
                        (2 if args.cfg else 1, max_len))
    # warm OUTSIDE the timed window: the single-generate program can differ
    # from the generate_batch programs compiled in section 1, and a cold
    # compile inside the loop dominates the wall time (first run of this
    # tool read 0.409 img/s = one 52 s compile + 24 real generations)
    pipe.generate_async(
        "ab", token_ids=ids1, num_inference_steps=args.steps,
        image_size=args.image_size, sampler=args.sampler, cfg=args.cfg,
        seed=999,
    ).result()
    t0 = time.perf_counter()
    pending = pipe.generate_async(
        "ab", token_ids=ids1, num_inference_steps=args.steps,
        image_size=args.image_size, sampler=args.sampler, cfg=args.cfg,
        seed=0,
    )
    for i in range(1, n):
        nxt = pipe.generate_async(
            "ab", token_ids=ids1, num_inference_steps=args.steps,
            image_size=args.image_size, sampler=args.sampler, cfg=args.cfg,
            seed=i,
        )
        pending.result()
        pending = nxt
    pending.result()
    wall = time.perf_counter() - t0
    results["single_shot_async"] = {
        "images_per_sec": round(n / wall, 3), "wall_s": round(wall, 3)
    }
    print(f"single-shot async loop: {n / wall:.3f} img/s", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
