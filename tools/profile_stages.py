#!/usr/bin/env python3
"""Stage-level timing on the real chip: CLIP encode, one CFG-batched UNet
step, VAE decode, and the full pipeline — to direct kernel work
(SURVEY.md §5 tracing row).  Run: python tools/profile_stages.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready does not truly synchronize through the axon relay;
    # a device->host fetch does.
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times))


def main():
    from sdtpu.config import TINY_SD, get_preset
    from sdtpu.models.clip import clip_encode
    from sdtpu.models.unet import unet_forward
    from sdtpu.models.vae import vae_decode
    from sdtpu.utils.weights import init_pipeline_params

    preset = sys.argv[1] if len(sys.argv) > 1 else "tiny-sd"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    config = get_preset(preset)
    lat = size // 8

    shapes = jax.eval_shape(lambda k: init_pipeline_params(k, config), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = jax.device_put(params)

    cd = config.compute_dtype
    ids = jnp.ones((2, 77), jnp.int32)
    latents = jnp.zeros((2, lat, lat, 4), cd)
    ts = jnp.full((2,), 500.0, jnp.float32)
    ctx = jnp.zeros((2, 77, config.unet.cross_attention_dim), cd)
    z = jnp.zeros((1, lat, lat, 4), cd)

    clip_fn = jax.jit(lambda p, i: clip_encode(i, p["clip"], config.clip)[0])
    unet_fn = jax.jit(lambda p, x, t, c: unet_forward(x, t, c, p["unet"], config.unet))
    vae_fn = jax.jit(lambda p, x: vae_decode(x, p["vae_decoder"], config.vae))

    for name, fn, args in [
        ("clip (2x77)", clip_fn, (params, ids)),
        (f"unet step (2x{lat}x{lat})", unet_fn, (params, latents, ts, ctx)),
        (f"vae decode (1x{lat}x{lat})", vae_fn, (params, z)),
    ]:
        best, med = timeit(fn, *args)
        print(f"{name:28s} best {best*1000:8.2f} ms   median {med*1000:8.2f} ms")

    steps = 25
    unet_best = timeit(unet_fn, params, latents, ts, ctx)[0]
    vae_best = timeit(vae_fn, params, z)[0]
    clip_best = timeit(clip_fn, params, ids)[0]
    print(f"\nideal 25-step total = clip + 25*unet + vae = "
          f"{(clip_best + steps*unet_best + vae_best)*1000:.1f} ms")


if __name__ == "__main__":
    main()
