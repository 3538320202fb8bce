#!/usr/bin/env python3
"""Probe: time the int8 vs bf16 slab conv kernel STANDALONE at each
SD-family-distinct conv shape (chained scan, relay-RTT subtracted).

This is the tool that disproved the round-3 "int8 pathologies": e2e
measurements showed SD2.1 transformer int8 at 7.7 s/image and SDXL conv
int8 at 83 s/image, which were initially diagnosed as XLA/Mosaic int8
lowering pathologies — but this per-shape probe showed every int8 slab
geometry HEALTHY (128x128 int8 1.3x FASTER than bf16), which localized
the real cause to host-resident numpy param leaves re-transferring
through the relay on every jit call (BENCHLOG round 3 post-mortem).

Protocol lesson it encodes: before diagnosing a kernel/lowering pathology
from an e2e number, reproduce the regression in a single-op probe at the
exact shape.  Chain length >= 30 with the ~28 ms relay RTT subtracted;
sub-0.3 ms/op readings are still drift-dominated (use XProf for those).

Usage: python tools/probe_int8_slab.py [chain]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.kernels.conv2d import conv3x3_gemm_slab, plan_slab
from sdtpu.utils.runtime import enable_compilation_cache

BF16_PEAK = 197e12  # v5e
RTT = 0.028  # relay round-trip floor subtracted from each chained timing

# (b, h, w, ci, co): the distinct resblock conv shapes across the family
SHAPES = [
    (2, 64, 64, 640, 640),     # SDXL level-1
    (2, 64, 64, 1920, 640),
    (2, 32, 32, 1280, 1280),   # SDXL level-2 / SD1.5+SD2.1 level-3
    (2, 32, 32, 2560, 1280),
    (2, 64, 64, 320, 320),     # tiny-sd / SD1.5 level-0 at 512px
    (2, 128, 128, 320, 320),   # SDXL level-0 at 1024px
]


def _sync(o):
    # jax.block_until_ready does not synchronize through the relay tunnel;
    # a 1-element device->host fetch does (CLAUDE.md).
    np.asarray(jax.device_get(o.ravel()[0]))


def main() -> None:
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    enable_compilation_cache()
    for b, h, w, ci, co in SHAPES:
        plan = plan_slab((b, h, w, ci), (3, 3, ci, co), has_prologue=True)
        if plan is None:
            print(f"{h}x{w} {ci}->{co}: no slab plan (XLA path)")
            continue
        h_tile, co_tile = plan
        x = jnp.zeros((b, h, w, ci), jnp.bfloat16)
        cb = jnp.zeros((co,), jnp.float32)
        a = jnp.ones((b, ci), jnp.float32)
        bb = jnp.zeros((b, ci), jnp.float32)
        flops = 2 * b * h * w * 9 * ci * co
        variants = [
            ("bf16", jnp.zeros((3, 3, ci, co), jnp.bfloat16), {}),
            ("int8", jnp.zeros((3, 3, ci, co), jnp.int8),
             {"act_inv_scale": jnp.ones((ci,), jnp.float32),
              "act_zp": jnp.zeros((ci,), jnp.float32),
              "w_scale": jnp.ones((co,), jnp.float32)}),
        ]
        for name, kern, extra in variants:
            @jax.jit
            def run(x, k, extra=extra, h_tile=h_tile, co_tile=co_tile):
                def body(c, _):
                    o = conv3x3_gemm_slab(
                        c, k, cb, prologue_scale=a, prologue_bias=bb,
                        h_tile=h_tile, co_tile=co_tile, **extra)
                    # nonlinear coupling: XLA hoists dot(x+c, w) out of a
                    # scan if the coupling is linear (CLAUDE.md lesson)
                    d = jnp.mean(o, axis=-1, keepdims=True) * 1e-6
                    return c + d.astype(c.dtype), ()
                out, _ = jax.lax.scan(body, x, None, length=chain)
                return out

            try:
                t0 = time.perf_counter()
                _sync(run(x, kern))
                comp = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    _sync(run(x, kern))
                    ts.append(time.perf_counter() - t0)
                per = (float(np.median(ts)) - RTT) / chain
                print(f"{h}x{w} {ci}->{co} plan={plan} {name}: "
                      f"{per * 1000:8.3f} ms/conv "
                      f"({flops / per / BF16_PEAK * 100:5.1f}% bf16-peak; "
                      f"compile {comp:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001 — probe reports, not raises
                print(f"{h}x{w} {ci}->{co} {name}: FAIL {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
