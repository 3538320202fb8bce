#!/usr/bin/env python3
"""Benchmark: Tiny-SD 512x512 txt2img, 25 DDPM steps, CFG 7.5, batch 1 —
the BASELINE.md primary metric (images/sec/chip + p50 latency).

The reference publishes no numbers (README.md:56 lists benchmarking as TODO);
the target is the driver north star: < 1 s/image on one v5e chip, so
``vs_baseline`` is images/sec relative to 1.0 img/s.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N, ...}

Runs with random weights (perf is weight-value independent; the reference
only ever runs random weights) and fixed token ids (the tokenizer is host-
side and excluded, as is PNG encoding; timing covers tokens -> fetched
uint8 image on the host — the product deliverable — with the rescale/clamp
packed on device inside the jit program).
"""

import argparse
import json
import statistics
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny-sd")
    ap.add_argument("--image-size", type=int, default=None,
                    help="default: the preset's native size")
    ap.add_argument("--steps", type=int, default=None,
                    help="default: 25 (or the preset's native step count)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--attention-impl", default=None,
                    choices=["auto", "xla", "flash"])
    ap.add_argument("--sampler", default=None,
                    help="default: the preset's native sampler")
    ap.add_argument("--img2img", action="store_true",
                    help="BASELINE config 2: VAE-encode an init image first")
    ap.add_argument("--strength", type=float, default=0.75)
    ap.add_argument("--no-cfg", action="store_true",
                    help="force guidance off (distilled presets default off)")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8-quantize the UNet resblock convs "
                         "(sdtpu/utils/quant.py; 2x int8 MXU path)")
    ap.add_argument("--int8-transformer", action="store_true",
                    help="with --int8: also quantize the post-LN "
                         "transformer matmuls (perf-neutral, costs "
                         "fidelity budget — see quant.py)")
    ap.add_argument("--int8-transformer-full", action="store_true",
                    help="with --int8: transformer='full' — also quantize "
                         "the out-projections + GeGLU down with runtime "
                         "per-row activation scales")
    ap.add_argument("--int8-vae", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="with --int8: also quantize the VAE decoder's "
                         "resnet convs (decode is ~32%% of a few-step "
                         "serving batch).  Default: auto — ON for few-step "
                         "presets (int8-UNet-only async-copy stall, "
                         "BENCHLOG round 4); --no-int8-vae forces off")
    ap.add_argument("--controlnet", action="store_true",
                    help="attach a random-init ControlNet at the preset's "
                         "dims and condition on a control image (measures "
                         "the encoder-copy overhead; ~+40%% UNet encoder "
                         "FLOPs)")
    ap.add_argument("--pag-scale", type=float, default=0.0,
                    help="Perturbed-Attention Guidance scale (3rd guidance "
                         "branch; measures PAG's step-cost overhead)")
    ap.add_argument("--encoder-cache", type=int, default=1,
                    help="encoder-feature reuse interval (run the encoder "
                         "once per K steps; decoder-only in between)")
    ap.add_argument("--no-overlap", action="store_true",
                    help="disable the pipelined dispatch-before-fetch "
                         "measurement (old strictly-sequential timing)")
    ap.add_argument("--serving", action="store_true",
                    help="BASELINE config 5: drive requests through the "
                         "micro-batching ServingEngine and measure "
                         "end-to-end request throughput")
    ap.add_argument("--requests", type=int, default=32,
                    help="request count for --serving")
    ap.add_argument("--device-batch", type=int, default=None,
                    help="ServingEngine device_batch_size for --serving: "
                         "rows per device program (coalesced batches split "
                         "into pipelined chunks; tools/ab_serving.py data)")
    args = ap.parse_args()
    if args.device_batch is not None and args.device_batch < 1:
        ap.error("--device-batch must be >= 1 (rows per device program)")

    import jax
    import numpy as np

    from sdtpu import StableDiffusionPipeline
    from sdtpu.config import get_preset
    from sdtpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    dev = jax.devices()[0]
    config = get_preset(args.preset)
    overrides = {}
    if args.attention_impl:
        overrides["attention_impl"] = args.attention_impl
    if overrides:
        config = config.replace(**overrides)
    steps = args.steps if args.steps is not None else config.default_steps
    sampler = args.sampler or config.default_sampler
    cfg = False if args.no_cfg else config.default_cfg
    if args.image_size is None:
        args.image_size = config.default_image_size
    print(f"device={dev}, preset={config.name}, "
          f"{args.image_size}px, {steps} steps ({sampler}, "
          f"{'cfg' if cfg else 'no-cfg'}), batch={args.batch}",
          file=sys.stderr)

    t0 = time.perf_counter()
    # zeros-shaped params: perf is weight-value independent and zeros
    # materialize instantly (random init costs ~2 min of pure setup)
    from sdtpu.utils.weights import init_pipeline_params

    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, config), jax.random.key(0)
    )
    import jax.numpy as jnp

    if args.int8:
        # quantize on HOST zeros: quantization pulls every weight to the
        # host, and fetching device arrays back through the relay cost
        # ~10 min of setup when the zeros lived on device first
        params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        pipe = StableDiffusionPipeline(config, params)
        transformer = ("full" if args.int8_transformer_full
                       else args.int8_transformer)
        pipe.quantize_int8(transformer=transformer, vae=args.int8_vae)
    else:
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        pipe = StableDiffusionPipeline(config, params)
    print(f"params materialized in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(40)
    # conditioned UNet families need their inputs: 9-channel inpaint
    # checkpoints take init+mask, 8-channel editing checkpoints take init
    latent_ch = config.vae.latent_channels
    bench_mask = None
    if config.unet.in_channels == 2 * latent_ch + 1:
        args.img2img = True
        bench_mask = np.zeros((args.image_size, args.image_size), np.uint8)
        bench_mask[:, args.image_size // 2:] = 255
        args.strength = 1.0
    elif config.unet.in_channels == 2 * latent_ch:
        args.img2img = True
    control_image = None
    if args.controlnet:
        from sdtpu.models.controlnet import init_controlnet

        cn_shapes = jax.eval_shape(
            lambda k: init_controlnet(k, config.unet), jax.random.key(0)
        )
        pipe.load_controlnet(
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), cn_shapes)
        )
        control_image = rng.integers(
            0, 255, (args.image_size, args.image_size, 3), dtype=np.uint8
        )
    if args.serving:
        _bench_serving(args, pipe, config, rng, dev, steps, sampler, cfg)
        return
    init_image = (
        rng.integers(0, 255, (args.image_size, args.image_size, 3),
                     dtype=np.uint8)
        if args.img2img else None
    )
    if args.batch == 1:
        ids = rng.integers(
            1, config.text_config.vocab_size,
            (2 if cfg else 1, config.text_config.max_length),
        )

        def run(seed: int, output: str = "uint8"):
            return pipe.generate(
                "bench", token_ids=ids, num_inference_steps=steps,
                seed=seed, image_size=args.image_size, output=output,
                sampler=sampler, cfg=cfg, init_image=init_image,
                strength=args.strength, control_image=control_image,
                mask_image=bench_mask,
                encoder_cache_interval=args.encoder_cache,
                pag_scale=args.pag_scale,
            )

    else:
        ids = rng.integers(
            1, config.text_config.vocab_size, (args.batch, config.text_config.max_length)
        )

        def run(seed: int, output: str = "uint8"):
            return pipe.generate_batch(
                ["bench"] * args.batch, token_ids=ids,
                num_inference_steps=steps, seed=seed,
                image_size=args.image_size, output=output,
                sampler=sampler, cfg=cfg,
                encoder_cache_interval=args.encoder_cache,
                pag_scale=args.pag_scale,
                init_images=(
                    [init_image] * args.batch
                    if init_image is not None else None
                ),
                mask_images=(
                    [bench_mask] * args.batch
                    if bench_mask is not None else None
                ),
                strength=args.strength,
                control_images=(
                    [control_image] * args.batch
                    if control_image is not None else None
                ),
            )

    t0 = time.perf_counter()
    run(0)
    print(f"compile + first run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    mode = "sequential" if args.no_overlap else "pipelined"
    if args.no_overlap:
        times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            run(i + 1)
            times.append(time.perf_counter() - t0)
            print(f"run {i}: {times[-1]*1000:.1f} ms", file=sys.stderr)
    else:
        # Pipelined stream (VERDICT.md round-2 item 4): dispatch image N+1
        # before fetching image N, so the ~2-relay-RTT host slice hides
        # behind device compute — the ServingEngine's dispatch trick
        # exposed to single-shot callers via output="device".  Per-image
        # time = the gap between successive fetch completions in steady
        # state (the first gap still carries the un-overlapped dispatch
        # and is dropped when enough repeats exist).
        marks, dispatches = [], []
        t0 = time.perf_counter()
        dispatches.append(t0)
        pending = run(1, output="device")
        for i in range(args.repeats):
            dispatches.append(time.perf_counter())
            nxt = run(i + 2, output="device")
            np.asarray(pending)  # fetch completed image i
            marks.append(time.perf_counter())
            pending = nxt
        np.asarray(pending)
        marks.append(time.perf_counter())  # final in-flight image
        times = [b - a for a, b in zip(marks, marks[1:])]
        if not times:  # --repeats 1
            times = [marks[0] - t0]
        # True per-request wall (dispatch -> host fetch complete); under
        # depth-1 pipelining this exceeds the inter-completion gap by the
        # queued-behind-predecessor time (VERDICT r4 weak 7: the gap alone
        # is a throughput basis, not a request latency).
        request_times = [m - d for d, m in zip(dispatches, marks)]
        for i, t in enumerate(times):
            print(f"gap {i}: {t*1000:.1f} ms", file=sys.stderr)
        print(
            "request latency p50: "
            f"{statistics.median(request_times)*1000:.1f} ms",
            file=sys.stderr,
        )

    p50 = statistics.median(times)
    images_per_sec = args.batch / p50
    variant = "img2img " if args.img2img else ""
    if args.encoder_cache > 1:
        variant = f"enc-cache{args.encoder_cache} " + variant
    if args.controlnet:
        variant = "controlnet " + variant
    if args.int8:
        variant = "int8 " + variant
    guidance = "CFG" if cfg else "no-CFG"
    # the analytic flop model covers neither the ControlNet encoder copy
    # nor the conditioned-UNet input channels / 3-branch edit batch; skip
    # MFU rather than misstate it
    flops = None if (
        args.controlnet or config.unet.in_channels != latent_ch
        or args.encoder_cache > 1
    ) else _program_flops(pipe, args, steps, sampler, cfg)
    result = {
        "metric": f"{args.preset} {args.image_size}x{args.image_size} "
                  f"{variant}{steps}-step {sampler} {guidance} images/sec/chip",
        "value": round(images_per_sec, 4),
        "unit": "images/sec",
        # the reference publishes NO numbers (BASELINE.md); vs_baseline is
        # relative to the driver north-star TARGET of 1.0 images/sec/chip
        "vs_baseline": round(images_per_sec / 1.0, 4),
        "baseline_definition": "north-star target 1.0 img/s (reference publishes none)",
        "p50_latency_s": round(p50, 4),
        # honest semantics (VERDICT r4 weak 7): under pipelined timing the
        # p50 above is the steady-state inter-completion gap (the
        # throughput basis), NOT a request latency — that is reported
        # separately below as dispatch->fetch-complete wall time.
        "p50_latency_semantics": (
            "inter_completion_gap" if mode == "pipelined" else "request_wall"
        ),
        "timing_mode": mode,
        "batch": args.batch,
        "device": str(dev),
    }
    if mode == "pipelined":
        result["p50_request_latency_s"] = round(
            statistics.median(request_times), 4
        )
    if flops:
        result["program_tflops"] = round(flops / 1e12, 2)
        # v5e peak: ~197 bf16 TFLOP/s per chip
        result["mfu_pct"] = round(100.0 * flops / p50 / 197e12, 1)
    print(json.dumps(result))


def _program_flops(pipe, args, steps, sampler, cfg):
    """Analytic MXU flop count of the generate() program (sdtpu/utils/
    flops.py) — XLA's cost_analysis counts the 25-step scan body ONCE and
    under-reports by ~25x, so the structural count is the honest basis for
    MFU."""
    if getattr(args, "pag_scale", 0.0) > 0.0:
        # PAG runs a 3rd guidance branch (with identity attention at the
        # PAG site) — the 2-branch analytic count doesn't model it, so
        # skip the MFU claim rather than report a wrong one
        return None
    try:
        from sdtpu.utils.flops import pipeline_flops

        return pipeline_flops(
            pipe.config, args.image_size, steps, args.batch, cfg=cfg,
            img2img=args.img2img, strength=args.strength,
        )
    except Exception:
        return None


def _bench_serving(args, pipe, config, rng, dev, steps, sampler, cfg) -> None:
    """BASELINE config 5: few-step large-batch serving THROUGH the
    micro-batching engine (queueing + coalescing + per-request RNG included),
    not raw generate_batch."""
    import time

    import numpy as np

    from sdtpu.pipeline.serving import ServingEngine

    n = args.requests - args.requests % args.batch or args.batch
    ids = rng.integers(
        1, config.text_config.vocab_size, (n, config.text_config.max_length)
    )
    init_image = mask_image = None
    latent_ch = config.vae.latent_channels
    if config.unet.in_channels != latent_ch:  # inpaint/edit presets
        init_image = rng.integers(
            0, 255, (args.image_size, args.image_size, 3), dtype=np.uint8
        )
        if config.unet.in_channels == 2 * latent_ch + 1:
            mask_image = np.zeros(
                (args.image_size, args.image_size), np.uint8
            )
            mask_image[:, args.image_size // 2:] = 255
    # precompile the bucket so the measurement is steady-state serving;
    # the device programs are the CHUNK sizes (engine default
    # DEFAULT_DEVICE_BATCH, or --device-batch), not the coalesced size.
    # NOTE: all requests are submitted up-front, so the only chunk sizes
    # reachable are min(db, batch) and batch % db — both warmed.  A live
    # deployment with max_wait timeouts can see any size in 1..db; warm
    # those explicitly there (ServingEngine docstring).
    from sdtpu.pipeline.serving import DEFAULT_DEVICE_BATCH

    db = (args.device_batch if args.device_batch is not None
          else DEFAULT_DEVICE_BATCH)
    warm_sizes = (
        tuple(sorted({min(db, args.batch)}
                     | ({args.batch % db} if args.batch % db else set())))
        if db else (args.batch,)
    )
    pipe.warmup(
        image_sizes=(args.image_size,), step_counts=(steps,),
        batch_sizes=warm_sizes, cfg=cfg, sampler=sampler,
        img2img=init_image is not None, inpaint=mask_image is not None,
        strength=1.0 if mask_image is not None else args.strength,
        pag_scale=args.pag_scale,
    )
    engine = ServingEngine(pipe, max_batch_size=args.batch, max_wait_ms=5.0,
                           device_batch_size=db)
    try:
        t0 = time.perf_counter()
        futs = [
            engine.submit(
                "bench", token_ids=ids[i], seed=i,
                num_inference_steps=steps, sampler=sampler, cfg=cfg,
                image_size=args.image_size,
                init_image=init_image, mask_image=mask_image,
                strength=1.0 if mask_image is not None else args.strength,
                pag_scale=args.pag_scale,
            )
            for i in range(n)
        ]
        for f in futs:
            f.result(timeout=600)
        wall = time.perf_counter() - t0
        stats = engine.stats()
    finally:
        engine.shutdown()

    result = {
        "metric": f"{args.preset} {args.image_size}x{args.image_size} "
                  f"{steps}-step {sampler} {'CFG' if cfg else 'no-CFG'} "
                  f"serving images/sec/chip",
        "value": round(n / wall, 4),
        "unit": "images/sec",
        "vs_baseline": round(n / wall / 1.0, 4),
        "baseline_definition": "north-star target 1.0 img/s (reference publishes none)",
        "requests": n,
        "mean_batch_size": round(stats["mean_batch_size"], 2),
        "batches": stats["batches"],
        "wall_s": round(wall, 3),
        "device": str(dev),
    }
    for k in ("request_latency_p50_s", "request_latency_p95_s"):
        if k in stats:
            result[k] = round(stats[k], 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
