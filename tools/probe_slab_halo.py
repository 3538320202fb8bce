#!/usr/bin/env python3
"""Probe: slab-conv halo cost and the fused nearest-2x-upsample conv, on
the real chip at UNet + VAE-decoder shapes.

OUTCOME (round 3): the decode trace attributed ~10% of VAE-decode time to
the round-2 kernel's materialized overlapping-slab copies (dynamic-update-
slice fusions) and ~7% to XLA's broadcast+reshape nearest-upsample.  Both
were replaced by in-VMEM assembly (clamped single-row halo views /
``upsample=True``); the materialize-vs-views A/B measured with this probe
before the materialize path was removed (v5e, same-process, ms/conv):

  2x64x64x640   ns=1  mat 0.4055  views 0.4068   (chain 500 — neutral)
  2x32x32x1280  ns=1  mat 0.4422  views 0.4439   (chain 500 — neutral)
  8x128x128x512 ns=4  mat 4.826   views 4.721
  8x256x256x256 ns=16 mat 5.551   views 5.463
  8x512x512x128 ns=64 mat 8.867   views 8.374
  (int8: 128px 3.606 -> 3.424, 512px 8.836 -> 8.420; small shapes neutral)

plus the removed XLA-side slab-copy traffic e2e.  The probe now times the
shipped kernel at those shapes and keeps the fused-vs-unfused upsample A/B
(which remains constructible).  Chained scan, nonlinear feedback, relay
RTT subtracted (CLAUDE.md lessons; sub-0.3 ms rows need chain >= 500).

Usage: python tools/probe_slab_halo.py [chain]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.kernels.conv2d import conv3x3_gemm_slab, plan_slab
from sdtpu.ops.conv import conv2d
from sdtpu.ops.resize import nearest_upsample
from sdtpu.utils.runtime import enable_compilation_cache

BF16_PEAK = 197e12
RTT = 0.028

# (b, h, w, c): ci == co so the conv chains; UNet maps then decoder maps
HALO_SHAPES = [
    (2, 64, 64, 640),      # SDXL level-1 (ns=1)
    (2, 128, 128, 320),    # SDXL level-0 (ns=4)
    (8, 128, 128, 512),    # decoder 128px level, serving batch
    (8, 256, 256, 256),    # decoder 256px level
    (8, 512, 512, 128),    # decoder 512px level
]

# (b, h, w, c): SMALL-map shapes feeding an upsample conv (decoder)
UP_SHAPES = [
    (8, 64, 64, 512),
    (8, 128, 128, 512),
    (8, 256, 256, 256),
]


def _sync(o):
    np.asarray(jax.device_get(o.ravel()[0]))


def _time(run, *args, chain):
    t0 = time.perf_counter()
    _sync(run(*args))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(*args))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - RTT) / chain, comp


def main() -> None:
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    enable_compilation_cache()

    print("== slab conv (view-based halos; prologue-affine) ==", flush=True)
    for b, h, w, c in HALO_SHAPES:
        plan = plan_slab((b, h, w, c), (3, 3, c, c), has_prologue=True)
        if plan is None:
            print(f"{b}x{h}x{w}x{c}: no slab plan", flush=True)
            continue
        ht, cot = plan
        x = jnp.zeros((b, h, w, c), jnp.bfloat16)
        k = jnp.zeros((3, 3, c, c), jnp.bfloat16)
        a = jnp.ones((b, c), jnp.float32)
        pb = jnp.zeros((b, c), jnp.float32)
        flops = 2 * b * h * w * c * c * 9

        @jax.jit
        def run(x):
            def body(carry, _):
                o = conv3x3_gemm_slab(
                    carry, k, prologue_scale=a, prologue_bias=pb,
                    h_tile=ht, co_tile=cot,
                )
                return carry + jnp.abs(o) * 1e-3, ()
            out, _ = jax.lax.scan(body, x, None, length=chain)
            return out

        try:
            per, comp = _time(run, x, chain=chain)
            print(f"{b}x{h}x{w}x{c} ns={h // ht:3d}: "
                  f"{per * 1000:7.3f} ms/conv "
                  f"({flops / per / BF16_PEAK * 100:5.1f}% peak; "
                  f"compile {comp:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{b}x{h}x{w}x{c}: FAIL {type(e).__name__} "
                  f"{str(e)[:140]}", flush=True)

    print("== nearest-2x upsample conv: unfused (XLA up + slab conv) vs "
          "fused (in-kernel expand) ==", flush=True)
    for b, hs, ws, c in UP_SHAPES:
        plan = plan_slab((b, 2 * hs, 2 * ws, c), (3, 3, c, c))
        if plan is None or plan[0] % 2:
            print(f"{b}x{hs}x{ws}x{c}: no even slab plan", flush=True)
            continue
        ht, cot = plan
        x = jnp.zeros((b, hs, ws, c), jnp.bfloat16)
        k = jnp.zeros((3, 3, c, c), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.float32)
        flops = 2 * b * (2 * hs) * (2 * ws) * c * c * 9
        for mode in ("unfused", "fused"):
            @jax.jit
            def run(x, mode=mode):
                def body(carry, _):
                    if mode == "fused":
                        o = conv3x3_gemm_slab(
                            carry, k, bias, h_tile=ht, co_tile=cot,
                            upsample=True,
                        )
                    else:
                        up = nearest_upsample(carry, 2)
                        o = conv3x3_gemm_slab(
                            up, k, bias, h_tile=ht, co_tile=cot,
                        )
                    # fold the 2x map back to the small shape (nonlinear)
                    return carry + jnp.abs(o[:, ::2, ::2, :]) * 1e-3, ()
                out, _ = jax.lax.scan(body, x, None, length=chain)
                return out

            try:
                per, comp = _time(run, x, chain=chain)
                print(f"{b}x{hs}x{ws}x{c} -> {2 * hs}px {mode:>7}: "
                      f"{per * 1000:7.3f} ms/conv "
                      f"({flops / per / BF16_PEAK * 100:5.1f}% peak; "
                      f"compile {comp:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{b}x{hs}x{ws}x{c} {mode}: FAIL {type(e).__name__} "
                      f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
