#!/usr/bin/env python3
"""Same-process A/B: conv1 -> GN2 stats chaining on vs off.

``kernels/conv2d.py:emit_stats`` makes the slab conv emit per-channel
output moments so the next GroupNorm's statistics derive without
re-reading the mid map from HBM (the one stat pass XLA cannot fuse —
its producer is a Pallas custom call).  Default-ON behind
SDTPU_CONV_STATS; this measures the shipping UNet scan and the VAE
decoder with the flag flipped at trace time per jit closure.

One process, interleaved repeats (relay-RTT drift -> variance, not bias).

Usage: python tools/ab_conv_stats.py [preset] [image_size] [chain_len]
       python tools/ab_conv_stats.py --vae [image_size] [reps_per_call]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def _ab_unet(preset, size, chain):
    import sdtpu.kernels.conv2d as conv2d_mod
    from sdtpu.config import get_preset
    from sdtpu.models.unet import (
        precompute_cross_kv,
        precompute_time_projections,
        unet_forward,
    )
    from sdtpu.utils.weights import init_pipeline_params

    config = get_preset(preset)
    lat = size // 8

    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, config), jax.random.key(0)
    )
    params = jax.device_put(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )["unet"]

    cd = config.compute_dtype
    x0 = jnp.zeros((2, lat, lat, config.unet.in_channels), cd)
    ts = jnp.full((2,), 500.0, jnp.float32)
    ctx = jnp.zeros((2, 77, config.unet.cross_attention_dim), cd)

    def make(stats_chain: bool):
        def run(p, x, t, c):
            conv2d_mod.CONV_STATS_CHAIN = stats_chain  # read at TRACE time
            kv = precompute_cross_kv(c, p, config.unet)
            tcache = precompute_time_projections(
                jnp.linspace(999.0, 1.0, chain), p, config.unet,
                batch=x.shape[0], dtype=cd,
            )

            def body(carry, i):
                out = unet_forward(
                    carry, t, c, p, config.unet,
                    attention_impl="flash", conv_impl="gemm",
                    cross_kv=kv,
                    time_cache=jax.tree.map(lambda a: a[i], tcache),
                )
                return out.astype(carry.dtype), ()

            out, _ = jax.lax.scan(
                body, x, jnp.arange(chain, dtype=jnp.int32)
            )
            return out

        return jax.jit(run)

    return (
        [("stats=off", make(False)), ("stats=ON ", make(True))],
        lambda fn: fn(params, x0, ts, ctx),
        chain,
    )


def _ab_vae(size, reps):
    """VAE decode A/B (the few-step bottleneck: ~15 ms of LCM's 59 ms)."""
    import sdtpu.kernels.conv2d as conv2d_mod
    from sdtpu.config import get_preset
    from sdtpu.models.vae import init_vae_decoder, vae_decode

    config = get_preset("tiny-sd")
    lat = size // 8
    cd = config.compute_dtype
    params = jax.device_put(
        jax.tree.map(
            lambda s: jnp.zeros(
                s.shape,
                cd if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype,
            ),
            jax.eval_shape(
                lambda k: init_vae_decoder(k, config.vae), jax.random.key(0)
            ),
        )
    )
    z0 = jnp.zeros((1, lat, lat, config.vae.latent_channels), cd)

    def make(stats_chain: bool):
        def run(p, z):
            conv2d_mod.CONV_STATS_CHAIN = stats_chain

            def body(carry, _):
                img = vae_decode(carry, p, config.vae, conv_impl="gemm")
                # nonlinear coupling back to latent size so XLA cannot
                # collapse the chain (BENCHLOG lesson)
                red = jnp.tanh(img.astype(jnp.float32).mean())
                return carry + red.astype(carry.dtype) * 1e-6, ()

            out, _ = jax.lax.scan(body, z, None, length=reps)
            return out

        return jax.jit(run)

    return (
        [("stats=off", make(False)), ("stats=ON ", make(True))],
        lambda fn: fn(params, z0),
        reps,
    )


def main():
    from sdtpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    if len(sys.argv) > 1 and sys.argv[1] == "--vae":
        size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
        variants, call, n = _ab_vae(size, reps)
        unit = "call"
    else:
        preset = sys.argv[1] if len(sys.argv) > 1 else "tiny-sd"
        size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
        chain = int(sys.argv[3]) if len(sys.argv) > 3 else 25
        variants, call, n = _ab_unet(preset, size, chain)
        unit = "step"

    for name, fn in variants:  # compile both before timing
        t0 = time.perf_counter()
        _sync(call(fn))
        print(f"{name}: compile {time.perf_counter() - t0:.0f}s", flush=True)

    times = {name: [] for name, _ in variants}
    for _ in range(7):
        for name, fn in variants:
            t0 = time.perf_counter()
            _sync(call(fn))
            times[name].append(time.perf_counter() - t0)
    meds = {}
    for name, ts_ in times.items():
        med = float(np.median(ts_))
        meds[name] = med
        print(
            f"{name}: {med * 1000:8.1f} ms / {n} {unit}s = "
            f"{med / n * 1000:6.2f} ms/{unit}  "
            f"(min {min(ts_) / n * 1000:6.2f})",
            flush=True,
        )
    off, on = meds["stats=off"], meds["stats=ON "]
    print(f"conv-stats chain: {off / on:5.3f}x vs recompute "
          f"({(off - on) / n * 1000:+.3f} ms/{unit})")


if __name__ == "__main__":
    main()
