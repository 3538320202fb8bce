#!/usr/bin/env python3
"""Same-process A/B of UNet-step implementations on the real chip.

The relay RTT floor (~28 ms) and its drift make cross-process comparisons
of ~12 ms steps meaningless (BENCHLOG.md), so: chain N UNet steps inside one
``lax.scan`` (output feeds back as input — in/out channels match) and time
the whole chain with a device->host sync.  One process, all variants.

Usage: python tools/ab_unet.py [preset] [image_size] [chain_len]
"""

import itertools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def main():
    from sdtpu.config import get_preset
    from sdtpu.models.unet import unet_forward
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

    def make(attn, conv, hoist=False):
        def run(p, x, t, c):
            kwargs = {}
            if hoist:
                from sdtpu.models.unet import (
                    precompute_cross_kv,
                    precompute_time_projections,
                )

                kwargs["cross_kv"] = precompute_cross_kv(c, p, config.unet)
                tcache = precompute_time_projections(
                    jnp.linspace(999.0, 1.0, chain), p, config.unet,
                    batch=x.shape[0], dtype=cd,
                )

            def body(carry, i):
                kw = dict(kwargs)
                if hoist:
                    kw["time_cache"] = jax.tree.map(lambda a: a[i], tcache)
                out = unet_forward(
                    carry, t, c, p, config.unet,
                    attention_impl=attn, conv_impl=conv,
                    **kw,
                )
                return out.astype(carry.dtype), ()

            out, _ = jax.lax.scan(
                body, x, jnp.arange(chain, dtype=jnp.int32)
            )
            return out

        return jax.jit(run)

    variants = [
        ("attn=xla   conv=xla ", make("xla", "xla")),
        ("attn=flash conv=xla ", make("flash", "xla")),
        ("attn=flash conv=gemm", make("flash", "gemm")),
        ("attn=xla   conv=gemm", make("xla", "gemm")),
        ("flash+gemm + hoists ", make("flash", "gemm", hoist=True)),
    ]

    results = {}
    for name, fn in variants:
        t0 = time.perf_counter()
        _sync(fn(params, x0, ts, ctx))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(fn(params, x0, ts, ctx))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        results[name] = med
        print(
            f"{name}: {med*1000:8.1f} ms / {chain} steps = "
            f"{med/chain*1000:6.2f} ms/step   (compile {compile_s:.0f}s, "
            f"min {min(times)/chain*1000:6.2f})",
            flush=True,
        )
    base = results[variants[0][0]]
    for name, med in results.items():
        print(f"{name}: {base/med:5.2f}x vs dense-xla")


if __name__ == "__main__":
    main()
