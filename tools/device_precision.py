#!/usr/bin/env python3
"""Per-stage bf16 drift gates ON the real device (VERDICT.md round-2 item 7).

tests/test_precision.py pins bf16-vs-f32 drift per stage, but its bases were
measured on CPU at highest matmul precision; the TPU's MXU accumulation AND
the TPU-only kernel paths (flash attention, slab gemm convs) never flow
through those gates.  This tool runs the same comparisons on the default
backend at REAL tiny-sd dims:

  * reference side: f32 params/compute through plain XLA ops,
  * candidate side: bf16 through the shipping TPU path
    (attention_impl="flash", conv_impl="gemm" on TPU; "xla" on CPU),

so one number covers MXU rounding + kernel-vs-XLA parity + fp32 islands.
Gates carry the same headroom policy as the CPU suite (~1.7-2x over the
measured basis).  Run once per round; record the JSON in BENCHLOG.md:

    timeout 580 python tools/device_precision.py
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny-sd")
    ap.add_argument("--latent", type=int, default=64,
                    help="latent grid (64 = 512px)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdtpu.config import get_preset
    from sdtpu.models.clip import clip_encode
    from sdtpu.models.unet import unet_forward
    from sdtpu.models.vae import vae_decode
    from sdtpu.utils.image import psnr
    from sdtpu.utils.runtime import enable_compilation_cache
    from sdtpu.utils.weights import cast_pytree, init_pipeline_params

    enable_compilation_cache()
    backend = jax.default_backend()
    impl = ("xla", "xla") if backend == "cpu" else ("flash", "gemm")
    config = get_preset(args.preset)

    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, config), jax.random.key(0)
    )
    host = np.random.default_rng(99)
    p32 = jax.tree.map(
        lambda s: jnp.asarray(
            host.standard_normal(s.shape, dtype=np.float32) * 0.04
        ),
        shapes,
    )
    p16 = cast_pytree(p32, jnp.bfloat16)
    print(f"params in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def rel(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9))

    rng = np.random.default_rng(3)
    lat = rng.standard_normal(
        (2, args.latent, args.latent, config.unet.in_channels)
    ).astype(np.float32)
    ctx = rng.standard_normal(
        (2, config.clip.max_length, config.unet.cross_attention_dim)
    ).astype(np.float32)
    ts = np.full((2,), 500.0, np.float32)
    ids = rng.integers(1, config.clip.vocab_size, (2, config.clip.max_length))

    results = {"backend": backend, "preset": args.preset,
               "candidate_path": f"bf16 attention={impl[0]} conv={impl[1]}"}
    checks = []

    # --- CLIP ---
    t0 = time.perf_counter()
    h32, _ = jax.jit(
        lambda p, i: clip_encode(i, p, config.clip)
    )(p32["clip"], jnp.asarray(ids))
    h16, _ = jax.jit(
        lambda p, i: clip_encode(i, p, config.clip)
    )(p16["clip"], jnp.asarray(ids))
    r = rel(h32, h16)
    checks.append(("clip_rel", r, 0.015))
    print(f"clip rel {r:.4f} ({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

    # --- UNet one CFG-batched step ---
    t0 = time.perf_counter()
    u32 = jax.jit(
        lambda p, x, t, c: unet_forward(x, t, c, p, config.unet)
    )(p32["unet"], jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx))
    u16 = jax.jit(
        lambda p, x, t, c: unet_forward(
            x, t, c, p, config.unet,
            attention_impl=impl[0], conv_impl=impl[1],
        )
    )(
        p16["unet"], jnp.asarray(lat, jnp.bfloat16), jnp.asarray(ts),
        jnp.asarray(ctx, jnp.bfloat16),
    )
    r = rel(u32, u16)
    checks.append(("unet_rel", r, 0.03))
    print(f"unet rel {r:.4f} ({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

    # --- VAE decode ---
    t0 = time.perf_counter()
    z = rng.standard_normal(
        (1, args.latent, args.latent, config.vae.latent_channels)
    ).astype(np.float32)
    d32 = jax.jit(
        lambda p, x: vae_decode(x, p, config.vae)
    )(p32["vae_decoder"], jnp.asarray(z))
    d16 = jax.jit(
        lambda p, x: vae_decode(
            x, p, config.vae, attention_impl=impl[0], conv_impl=impl[1]
        )
    )(p16["vae_decoder"], jnp.asarray(z, jnp.bfloat16))
    r = rel(d32, d16)
    score = psnr(np.asarray(d32, np.float32), np.asarray(d16, np.float32))
    checks.append(("vae_decode_rel", r, 0.03))
    checks.append(("vae_decode_psnr_db", score, 45.0))
    print(f"vae rel {r:.4f} psnr {score:.1f} ({time.perf_counter()-t0:.0f}s)",
          file=sys.stderr)

    ok = True
    for name, val, gate in checks:
        passed = val > gate if name.endswith("_db") else val < gate
        ok &= passed
        results[name] = round(float(val), 5)
        results[name + "_gate"] = gate
    results["pass"] = bool(ok)
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
