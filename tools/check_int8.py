#!/usr/bin/env python3
"""On-chip validation of the int8 (W8A8) conv path (VERDICT round-2 item 2).

Two gates, run on the real device at REAL tiny-sd dims with host-seeded
random weights:

1. kernel parity — the Mosaic int8 slab kernel vs the interpret-mode-tested
   quantized math (rel err vs the FLOAT slab path must sit in the ~2%
   8-bit budget, and vs the CPU-emulated quantized result must be tiny);
2. pipeline PSNR — int8-quantized pipeline vs the bf16 pipeline on fixed
   seeds: the shipping gate is >= 40 dB (BASELINE.md's fidelity bar applied
   to the quantization step).

Prints one JSON line; exit 0 = both gates pass.

    timeout 580 python tools/check_int8.py [--steps 25]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny-sd")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--image-size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdtpu.config import get_preset
    from sdtpu.kernels.conv2d import gn_silu_conv3x3_slab, plan_slab
    from sdtpu.pipeline.pipeline import StableDiffusionPipeline
    from sdtpu.utils.image import psnr
    from sdtpu.utils.quant import (
        act_qparams_from_norm,
        quantize_conv_w8a8,
        quantize_pipeline_int8,
    )
    from sdtpu.utils.runtime import enable_compilation_cache
    from sdtpu.utils.weights import init_pipeline_params

    enable_compilation_cache()
    results = {"backend": jax.default_backend()}
    checks = []

    # --- gate 1: kernel-level parity at a hot shape ---
    rng = np.random.default_rng(5)
    b, h, w, ci, co, g = 2, 16, 16, 1280, 1280, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32),
                    jnp.bfloat16)
    norm = {"scale": jnp.asarray(rng.standard_normal(ci).astype(np.float32)),
            "bias": jnp.asarray(rng.standard_normal(ci).astype(np.float32))}
    k = jnp.asarray((rng.standard_normal((3, 3, ci, co)) * 0.05).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    ht, co_tile = plan_slab((b, h, w, ci), (3, 3, ci, co), has_prologue=True)
    want = np.asarray(gn_silu_conv3x3_slab(
        x, norm, k.astype(jnp.bfloat16), cb, num_groups=g,
        h_tile=ht, co_tile=co_tile,
    ), np.float32)
    s_act, z_act = act_qparams_from_norm(norm)
    q, w_scale, zp_corr = quantize_conv_w8a8(np.asarray(k), s_act, z_act)
    got = np.asarray(gn_silu_conv3x3_slab(
        x, norm, jnp.asarray(q), cb - jnp.asarray(zp_corr), num_groups=g,
        act_inv_scale=jnp.asarray(1.0 / s_act), act_zp=jnp.asarray(z_act),
        w_scale=jnp.asarray(w_scale),
        h_tile=ht, co_tile=co_tile,
    ), np.float32)
    rel = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    checks.append(("kernel_rel_vs_float", rel, 0.04, "lt"))
    print(f"int8 slab kernel vs float slab: rel {rel:.4f}", file=sys.stderr)

    # --- gate 2: pipeline PSNR int8 vs bf16 ---
    config = get_preset(args.preset)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        lambda kk: init_pipeline_params(kk, config), jax.random.key(0)
    )
    host = np.random.default_rng(1234)

    def make(path, s):
        # norm affines at their REAL init (gamma=1, beta=0): a blanket
        # randn*0.04 init gives gamma~0.04, which shrinks every conv branch
        # vs its residual and inflates the PSNR by ~30 dB (first run of
        # this tool) — real checkpoints have gamma ~ 1.
        key = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if s.ndim == 1 and key == "scale":
            arr = np.ones(s.shape, np.float32)
        elif s.ndim == 1 and key == "bias":
            arr = np.zeros(s.shape, np.float32)
        else:
            arr = (host.standard_normal(s.shape) * 0.04).astype(np.float32)
        return jnp.asarray(arr).astype(s.dtype)

    params = jax.tree_util.tree_map_with_path(make, shapes)
    print(f"params in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    pipe = StableDiffusionPipeline(config, params)
    qpipe = StableDiffusionPipeline(config, quantize_pipeline_int8(params))
    ids = host.integers(1, config.clip.vocab_size, (2, config.clip.max_length))
    kw = dict(token_ids=ids, num_inference_steps=args.steps, seed=40,
              image_size=args.image_size, output="float")
    t0 = time.perf_counter()
    want_img = pipe.generate("x", **kw)
    print(f"bf16 generate in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    got_img = qpipe.generate("x", **kw)
    print(f"int8 generate in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    score = psnr(np.asarray(want_img, np.float32),
                 np.asarray(got_img, np.float32))
    checks.append(("pipeline_psnr_db_vs_bf16", score, 40.0, "gt"))
    print(f"pipeline PSNR int8 vs bf16: {score:.1f} dB", file=sys.stderr)

    ok = True
    for name, val, gate, d in checks:
        passed = val < gate if d == "lt" else val > gate
        ok &= passed
        results[name] = round(float(val), 4)
        results[name + "_gate"] = gate
    results["steps"] = args.steps
    results["pass"] = bool(ok)
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
