#!/usr/bin/env python3
"""A/B the slab conv kernel's grid orders on the real chip.

The grid order decides which operand's blocks stay VMEM-resident across
consecutive grid steps (Mosaic skips a DMA when the block index repeats):
``input_outer`` re-fetches the whole weight tensor b*ns times;
``weight_outer`` fetches weights once but each input slab co_tiles times.
The round-3 trace showed the 16x16 resblock convs weight-DMA-bound
(59 MB of weights vs 1.6 MB of slabs per call at ~68% MXU), motivating
the switch (see conv3x3_gemm_slab docstring).

Chains N calls in one lax.scan with a real data dependency (the output
folds back into the input) so XLA cannot hoist the loop-invariant call;
asymmetric ci->co shapes chain on the input side.

Usage: python tools/ab_slab_grid.py [chain_len]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


# the resblock conv shapes the round-3 trace ranks most expensive
SHAPES = [
    (2, 16, 16, 2560, 1280),   # tiny-sd/SD1.5 level-2 decoder concat
    (2, 16, 16, 1280, 1280),
    (2, 32, 32, 1920, 640),
    (2, 64, 64, 960, 320),
    (1, 512, 512, 128, 128),   # VAE decoder full-res (ns huge)
]


def main():
    from sdtpu.kernels.conv2d import conv3x3_gemm_slab, plan_slab
    from sdtpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    for b, h, w, ci, co in SHAPES:
        x = jnp.zeros((b, h, w, ci), jnp.bfloat16)
        k = jnp.zeros((3, 3, ci, co), jnp.bfloat16)
        bias = jnp.zeros((co,), jnp.float32)
        slab = plan_slab((b, h, w, ci), (3, 3, ci, co))
        if slab is None:
            print(f"{b}x{h}x{w} {ci}->{co}: no slab plan", flush=True)
            continue
        ht, co_tile = slab
        flops = 2 * b * h * w * 9 * ci * co

        def chained(order):
            def run(x, k, bias):
                def body(carry, _):
                    out = conv3x3_gemm_slab(
                        carry, k, bias, h_tile=ht, co_tile=co_tile,
                        grid_order=order,
                    )
                    # fold the output back in (defeats loop hoisting)
                    dep = jnp.mean(out, axis=-1, keepdims=True) * 1e-6
                    return (carry + dep.astype(carry.dtype)), ()

                out, _ = jax.lax.scan(body, x, None, length=chain)
                return out

            return jax.jit(run)

        ns = h // ht
        n_co = -(-co // co_tile)
        w_mb = 9 * ci * co * 2 / 1e6
        i_mb = b * ns * (ht + 2) * (w + 2) * ci * 2 / 1e6
        print(f"== {b}x{h}x{w} {ci}->{co} slab={slab} ns={ns} n_co={n_co} "
              f"(W {w_mb:.1f} MB, slabs {i_mb:.1f} MB) ==", flush=True)
        empty = jax.jit(lambda x: x[0, 0, 0, :8])
        _sync(empty(x))
        for order in ("input_outer", "weight_outer"):
            fn = chained(order)
            t0 = time.perf_counter()
            _sync(fn(x, k, bias))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                _sync(fn(x, k, bias))
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            rtts = []
            for _ in range(5):
                t0 = time.perf_counter()
                _sync(empty(x))
                rtts.append(time.perf_counter() - t0)
            rtt = float(np.median(rtts))
            per = (med - rtt) / chain
            mxu = flops / per / 197e12 * 100
            dma = (w_mb * b * ns + i_mb if order == "input_outer"
                   else w_mb + i_mb * n_co)
            print(f"  {order:13s}: {per*1000:7.3f} ms/conv ({mxu:4.1f}% MXU; "
                  f"est DMA {dma:.0f} MB; rtt {rtt*1000:.0f} ms, "
                  f"compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
