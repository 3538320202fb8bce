#!/usr/bin/env python3
"""Same-process A/B of conv implementations on the real chip.

Chains N convs inside one ``lax.scan`` (co == ci so the output feeds back)
and times the whole chain with a device->host sync — the only timing that
resolves sub-ms kernels through the relay (BENCHLOG.md).

Usage: python tools/ab_conv.py [chain_len] [shape ...]
  shape = BxHxWxC, default set covers the SD2.1-768 / SDXL-1024 / VAE maps
  that the row-slab kernel unlocks (the 64x64 whole-map shapes were measured
  in round 1).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


DEFAULT_SHAPES = [
    (2, 96, 96, 320),     # SD2.1-768 level 0
    (2, 96, 96, 640),
    (2, 128, 128, 320),   # SDXL-1024 level 0
    (1, 128, 128, 512),   # VAE decoder
    (1, 256, 256, 256),
    (1, 512, 512, 128),
]


def main():
    from sdtpu.kernels.conv2d import (
        conv3x3_gemm_slab,
        gn_silu_conv3x3_slab,
        plan_co_tile,
        plan_slab,
    )
    from sdtpu.ops import conv2d, group_norm, silu
    from sdtpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    shapes = (
        [tuple(int(v) for v in s.split("x")) for s in sys.argv[2:]]
        if len(sys.argv) > 2
        else DEFAULT_SHAPES
    )

    for b, h, w, c in shapes:
        x = jnp.zeros((b, h, w, c), jnp.bfloat16)
        k = jnp.zeros((3, 3, c, c), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.float32)
        norm = {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}
        g = 32 if c % 32 == 0 else 16
        slab = plan_slab((b, h, w, c), (3, 3, c, c))
        slab_p = plan_slab((b, h, w, c), (3, 3, c, c), has_prologue=True)
        whole = plan_co_tile((b, h, w, c), (3, 3, c, c))
        flops = 2 * b * h * w * 9 * c * c * chain

        def chainer(step):
            def run(x, k, bias):
                def body(carry, _):
                    return step(carry, k, bias).astype(carry.dtype), ()

                out, _ = jax.lax.scan(body, x, None, length=chain)
                return out

            return jax.jit(run)

        variants = [("xla       ", chainer(
            lambda x, k, b_: conv2d(x, k, b_, padding=1)))]
        if whole is not None:
            from sdtpu.kernels.conv2d import conv3x3_gemm

            variants.append(("whole-map ", chainer(
                lambda x, k, b_: conv3x3_gemm(x, k, b_, co_tile=whole))))
        if slab is not None:
            variants.append((f"slab {slab}", chainer(
                lambda x, k, b_: conv3x3_gemm_slab(
                    x, k, b_, h_tile=slab[0], co_tile=slab[1]))))
        variants.append(("xla gn+silu+conv", chainer(
            lambda x, k, b_: conv2d(
                silu(group_norm(x, norm, num_groups=g)), k, b_, padding=1))))
        if slab_p is not None:
            variants.append((f"slab gn-prologue {slab_p}", chainer(
                lambda x, k, b_: gn_silu_conv3x3_slab(
                    x, norm, k, b_, num_groups=g,
                    h_tile=slab_p[0], co_tile=slab_p[1]))))

        print(f"== {b}x{h}x{w}x{c} (chain {chain}) ==", flush=True)
        # RTT probe: one compile per shape, reused across variants
        empty = jax.jit(lambda x: x[0, 0, 0, :8])
        _sync(empty(x))
        for name, step in variants:
            # The wall time of ONE sync includes the ~28 ms relay RTT, which
            # at chain=50 would inflate every per-conv number by ~0.6 ms —
            # time TWO chain lengths and report the slope (RTT-free).
            t0 = time.perf_counter()
            _sync(step(x, k, bias))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                _sync(step(x, k, bias))
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            _sync(empty(x))
            rtts = []
            for _ in range(5):
                t0 = time.perf_counter()
                _sync(empty(x))
                rtts.append(time.perf_counter() - t0)
            rtt = float(np.median(rtts))
            per = (med - rtt) / chain
            mxu = (flops / chain) / per / 197e12 * 100  # v5e bf16 peak
            print(
                f"  {name}: {per*1000:7.3f} ms/conv  ({mxu:4.1f}% MXU,"
                f" rtt {rtt*1000:.0f}ms, compile {compile_s:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
