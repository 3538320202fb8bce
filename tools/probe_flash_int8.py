#!/usr/bin/env python3
"""Probe (historical evidence): dynamically-quantized int8 flash-attention
modes vs bf16 on the real chip, at the SD family's latent self-attention
shapes.

OUTCOME (round 3, BENCHLOG "int8 flash attention: measured NEGATIVE"):
every int8 mode was SLOWER than bf16 on v5e (qk +6%, qk+pv +27%) — at
d_pad=128 the kernel co-bottlenecks on VPU softmax work, so the 2x int8
MXU path buys nothing while per-tile quantize/dequantize adds VPU cost.
The kernel's ``quant=`` modes were REMOVED after that measurement (no
winning configuration = dead weight); this probe now times only the
shipped bf16 kernel and prints the recorded int8 numbers for context.
For the current VPU-trim A/B see tools/probe_flash_vpu.py.

Usage: python tools/probe_flash_int8.py [chain]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.kernels.flash_attention import flash_attention_packed
from sdtpu.utils.runtime import enable_compilation_cache

RTT = 0.028

# (label, b, h, l, d_real): latent self-attention shapes (CFG-doubled batch)
SHAPES = [
    ("tiny-sd b1 512px L0", 2, 8, 4096, 40),
    ("serving b8 512px L0", 16, 8, 4096, 40),
    ("sd2.1 b1 768px L0", 2, 8, 9216, 64),
]


def _sync(o):
    np.asarray(jax.device_get(o.ravel()[0]))


def main() -> None:
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for label, b, h, l, d in SHAPES:
        qkv = []
        for _ in range(3):
            x = rng.standard_normal((b, h, l, 128), dtype=np.float32)
            x[..., d:] = 0.0
            qkv.append(jnp.asarray(x, jnp.bfloat16))
        q, k, v = qkv
        # padded-peak flops: QK + PV at d_pad=128
        flops = 2 * 2 * b * h * l * l * 128
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                o = flash_attention_packed(c, k, v, d_real=d)
                # nonlinear coupling so nothing hoists out of the scan
                delta = jnp.abs(o[..., :1]) * 1e-3
                return c + delta.astype(c.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=chain)
            return out

        try:
            t0 = time.perf_counter()
            _sync(run(q, k, v))
            comp = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(run(q, k, v))
                ts.append(time.perf_counter() - t0)
            per = (float(np.median(ts)) - RTT) / chain
            print(f"{label}  bf16: {per * 1000:7.3f} ms/call "
                  f"({flops / per / 197e12 * 100:5.1f}% bf16-padded-peak; "
                  f"compile {comp:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — probe reports, not raises
            print(f"{label} bf16: FAIL {type(e).__name__} "
                  f"{str(e)[:160]}", flush=True)

    print("\nRecorded int8-mode results (v5e, round 3; modes since removed):")
    print("  tiny-sd b2 L4096 D40 : bf16 1.046  int8-qk 1.106  qk+pv 1.328 ms")
    print("  serving b16 L4096 D40: bf16 8.947  int8-qk 9.279  qk+pv 11.104 ms")
    print("  sd2.1 b2 L9216 D64   : bf16 5.219  int8-qk 5.605  qk+pv 6.748 ms")


if __name__ == "__main__":
    main()
