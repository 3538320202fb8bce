#!/usr/bin/env python3
"""On-chip validation of the int8 (W8A8) conv path (VERDICT round-2 item 2).

Gates, run on the real device at REAL tiny-sd dims with host-seeded random
weights (gamma=1/beta=0 norms — realistic affines):

1. kernel parity — the Mosaic int8 slab kernel vs the float slab path
   (rel err within the 8-bit budget);
2. single-forward UNet parity — int8 vs bf16 on ONE CFG-batched forward
   (no chaotic step-to-step amplification): rel err < 4.5% (measured basis
   3.5% with convs + transformer matmuls quantized; bf16-vs-f32 forward
   basis is 0.85%, so this caps int8 at ~4-5x bf16's per-forward noise);
3. pipeline PSNR, RELATIVE — int8-vs-bf16 must score within 5 dB of the
   bf16-vs-f32 CONTROL on the same seeds.  Rationale: with random weights
   the 25-step pipeline is chaotic — round-3 measurements put the
   bf16-vs-f32 control itself at ~33 dB on-chip (int8-vs-bf16: 30.7), so
   an absolute 40 dB gate is unpassable BY CONSTRUCTION offline and would
   measure weight chaos, not quantization quality.  Chaos scales e2e mse
   with per-op noise^2, so the margin caps int8's per-op noise relative to
   bf16's (measured basis -3.3 dB with convs + transformer quantized;
   sigma sweep: 3.0 -> 29.4 dB, 4.5 -> 30.7 dB — resolution is not the
   binding term).  The absolute
   >= 40 dB north-star gate applies to REAL checkpoints and runs via
   tools/acceptance.py (step int8-fidelity) the moment one exists.

Prints one JSON line; exit 0 = all gates pass.

    timeout 1200 python tools/check_int8.py [--steps 25]
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
    ap.add_argument("--sigmas", type=float, default=None,
                    help="activation-range headroom (default: the library "
                         "default in sdtpu/utils/quant.py)")
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

    # --- gate 2: single-forward UNet parity (not chaos-amplified) ---
    # (built below once params exist; appended to checks after gate 3)
    # --- gate 3: pipeline PSNR int8 vs bf16, relative to the f32 control ---
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
    qkw = {} if args.sigmas is None else {"sigmas": args.sigmas}
    qpipe = StableDiffusionPipeline(
        config, quantize_pipeline_int8(params, **qkw)
    )

    # gate 2: one CFG-batched UNet forward, int8 vs bf16 (not chaotic)
    from sdtpu.models.unet import unet_forward

    lat = jnp.asarray(
        host.standard_normal((2, 64, 64, config.unet.in_channels)),
        jnp.bfloat16,
    )
    ctx = jnp.asarray(
        host.standard_normal(
            (2, config.clip.max_length, config.unet.cross_attention_dim)
        ),
        jnp.bfloat16,
    )
    ts = jnp.full((2,), 500.0, jnp.float32)
    fwd = jax.jit(
        lambda p, x, t, c: unet_forward(
            x, t, c, p, config.unet,
            attention_impl="flash", conv_impl="gemm",
        )
    )
    u16 = np.asarray(fwd(params["unet"], lat, ts, ctx), np.float32)
    uq = np.asarray(fwd(qpipe.params["unet"], lat, ts, ctx), np.float32)
    fwd_rel = float(np.linalg.norm(uq - u16) / (np.linalg.norm(u16) + 1e-9))
    checks.append(("unet_forward_rel_int8_vs_bf16", fwd_rel, 0.045, "lt"))
    print(f"single-forward UNet int8 vs bf16: rel {fwd_rel:.4f}",
          file=sys.stderr)
    del lat, ctx, fwd  # free the fwd program's workspace before the big runs

    # gate 2b: VAE decode int8 vs bf16 — decode is a SINGLE pass (no chaotic
    # step-to-step amplification), so an absolute PSNR gate is meaningful
    # even with random weights (unlike gate 3's relative form)
    from sdtpu.models.vae import vae_decode
    from sdtpu.utils.quant import quantize_vae_decoder_int8

    lat1 = jnp.asarray(
        host.standard_normal(
            (1, args.image_size // 8, args.image_size // 8,
             config.vae.latent_channels)
        ),
        jnp.bfloat16,
    )
    conv_impl = "xla" if jax.default_backend() == "cpu" else "gemm"
    dec = jax.jit(lambda p, z: vae_decode(z, p, config.vae,
                                          conv_impl=conv_impl))
    d16 = np.asarray(dec(params["vae_decoder"], lat1), np.float32)
    qdec = jax.tree.map(
        jnp.asarray, quantize_vae_decoder_int8(params["vae_decoder"])
    )
    dq = np.asarray(dec(qdec, lat1), np.float32)
    vae_psnr = psnr(d16, dq)
    checks.append(("vae_decode_psnr_db_int8_vs_bf16", vae_psnr, 30.0, "gt"))
    print(f"VAE decode int8 vs bf16: {vae_psnr:.1f} dB", file=sys.stderr)
    del dec, qdec, lat1

    ids = host.integers(1, config.clip.vocab_size, (2, config.clip.max_length))
    kw = dict(token_ids=ids, num_inference_steps=args.steps, seed=40,
              image_size=args.image_size, output="float")
    t0 = time.perf_counter()
    want_img = np.asarray(pipe.generate("x", **kw), np.float32)
    print(f"bf16 generate in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    got_img = np.asarray(qpipe.generate("x", **kw), np.float32)
    print(f"int8 generate in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    # free the quantized tree + its program before building the f32 control
    # (three full param trees + programs exhausted HBM in one run of this
    # tool — BENCHLOG round 3)
    del qpipe

    config32 = config.replace(compute_dtype=jnp.float32,
                              param_dtype=jnp.float32)
    p32 = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if a.dtype == jnp.bfloat16 else a, params
    )
    pipe32 = StableDiffusionPipeline(config32, p32)
    t0 = time.perf_counter()
    ref_img = np.asarray(pipe32.generate("x", **kw), np.float32)
    print(f"f32 control generate in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    del pipe32, p32
    score = psnr(want_img, got_img)
    control = psnr(ref_img, want_img)

    results["pipeline_psnr_db_int8_vs_bf16"] = round(float(score), 2)
    results["control_psnr_db_bf16_vs_f32"] = round(float(control), 2)
    checks.append(
        ("psnr_margin_db_vs_chaos_control", score - control, -5.0, "gt")
    )
    print(f"pipeline PSNR int8-vs-bf16 {score:.1f} dB; chaos control "
          f"bf16-vs-f32 {control:.1f} dB", file=sys.stderr)

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
