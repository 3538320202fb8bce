#!/usr/bin/env python3
"""Same-process A/B: Pallas packed out-projection GEMM on vs off.

The flash path's out-projection consumes the packed (B, H, L, Dp)
attention output; XLA lowers the direct einsum at ~8% MXU in a
tokens-on-lanes layout (round-3 trace, NOTES_r3.md idea 3).
``kernels/flash_attention.py:out_proj_packed`` pins the layout at a
custom-call boundary with the residual folded in — default-off behind
SDTPU_PACKED_OUT_PROJ pending this measurement.

One process, one chained-scan jit per variant (shipping config:
flash attention + gemm convs + hoists), interleaved repeats so relay-RTT
drift shows up as variance rather than bias.

Usage: python tools/ab_packed_proj.py [preset] [image_size] [chain_len]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def main():
    import sdtpu.ops.attention as attn_mod
    from sdtpu.config import get_preset
    from sdtpu.models.unet import (
        precompute_cross_kv,
        precompute_time_projections,
        unet_forward,
    )
    from sdtpu.utils.runtime import enable_compilation_cache
    from sdtpu.utils.weights import init_pipeline_params

    enable_compilation_cache()
    preset = sys.argv[1] if len(sys.argv) > 1 else "tiny-sd"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    config = get_preset(preset)
    lat = size // 8

    shapes = jax.eval_shape(
        lambda k: init_pipeline_params(k, config), jax.random.key(0)
    )
    params = jax.device_put(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )["unet"]

    cd = config.compute_dtype
    x0 = jnp.zeros((2, lat, lat, 4), cd)
    ts = jnp.full((2,), 500.0, jnp.float32)
    ctx = jnp.zeros((2, 77, config.unet.cross_attention_dim), cd)

    def make(packed: bool):
        def run(p, x, t, c):
            attn_mod._PACKED_OUT_PROJ = packed  # read at TRACE time
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

    variants = [("packed=off", make(False)), ("packed=ON ", make(True))]
    for name, fn in variants:  # compile both before timing
        t0 = time.perf_counter()
        _sync(fn(params, x0, ts, ctx))
        print(f"{name}: compile {time.perf_counter() - t0:.0f}s", flush=True)

    times = {name: [] for name, _ in variants}
    for _ in range(7):  # interleaved: drift -> variance, not bias
        for name, fn in variants:
            t0 = time.perf_counter()
            _sync(fn(params, x0, ts, ctx))
            times[name].append(time.perf_counter() - t0)
    meds = {}
    for name, ts_ in times.items():
        med = float(np.median(ts_))
        meds[name] = med
        print(
            f"{name}: {med * 1000:8.1f} ms / {chain} steps = "
            f"{med / chain * 1000:6.2f} ms/step  "
            f"(min {min(ts_) / chain * 1000:6.2f})",
            flush=True,
        )
    off, on = meds["packed=off"], meds["packed=ON "]
    print(f"packed out-proj: {off / on:5.3f}x vs einsum "
          f"({(off - on) / chain * 1000:+.3f} ms/step)")


if __name__ == "__main__":
    main()
