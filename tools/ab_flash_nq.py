#!/usr/bin/env python3
"""Same-process A/B of the flash-attention chain count (nq) on the FULL
UNet step.

The round-5 block sweep (tools/probe_flash_blocks.py) read nq=4 ~2% faster
than the shipped nq=2 at SD2.1's (2, 5, 9216, d64) self-attention — inside
chained-A/B drift for an isolated kernel, so the decision comes from the
full-step chain here (38 ms/step is far above the RTT-drift floor).

``flash_attention_packed`` resolves nq from the module global at CALL time
(round-5 change), so each variant builds a FRESH jitted chain after
mutating ``flash_attention._NQ`` — no os.environ, one process.

Usage: python tools/ab_flash_nq.py [preset] [image_size] [chain] [nq...]
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
    from sdtpu.config import get_preset
    from sdtpu.kernels import flash_attention as fa
    from sdtpu.models.unet import unet_forward
    from sdtpu.utils.runtime import enable_compilation_cache
    from sdtpu.utils.weights import init_pipeline_params

    enable_compilation_cache()
    preset = sys.argv[1] if len(sys.argv) > 1 else "sd21"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    nqs = [int(a) for a in sys.argv[4:]] or [2, 4, 2]
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
    added_cond = None
    if config.unet.addition_embed_dim:
        pooled = config.unet.addition_embed_dim - 6 * config.unet.addition_time_embed_dim
        added_cond = {
            "text_embeds": jnp.zeros((2, pooled), cd),
            "time_ids": jnp.tile(
                jnp.asarray([[size, size, 0, 0, size, size]], jnp.float32),
                (2, 1),
            ),
        }

    def make():
        def run(p, x, t, c):
            def body(carry, _):
                out = unet_forward(
                    carry, t, c, p, config.unet,
                    attention_impl="flash", conv_impl="gemm",
                    added_cond=added_cond,
                )
                return out.astype(carry.dtype), ()

            out, _ = jax.lax.scan(body, x, None, length=chain)
            return out

        return jax.jit(run)

    for nq in nqs:
        fa._NQ = nq
        fn = make()
        t0 = time.perf_counter()
        _sync(fn(params, x0, ts, ctx))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(fn(params, x0, ts, ctx))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(
            f"nq={nq}: {med * 1000:8.1f} ms / {chain} steps = "
            f"{med / chain * 1000:6.2f} ms/step  (compile {compile_s:.0f}s, "
            f"min {min(times) / chain * 1000:6.2f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
