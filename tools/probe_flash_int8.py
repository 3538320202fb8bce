#!/usr/bin/env python3
"""Probe: the dynamically-quantized int8 flash-attention modes vs bf16 on
the real chip, at the SD family's latent self-attention shapes.

The D=40/64 head dims pad to 128 MXU lanes, so the bf16 kernel runs at
~21% TRUE MFU even when it is ~70% of padded peak; the int8 modes ride the
v5e's 2x int8 MXU path, halving the padded-FLOP cost (BENCHLOG round 3 —
flash is the #1 in-scan bucket everywhere).  Also reports the max output
delta vs the bf16 kernel on the same inputs (quantization noise check).

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
        base = None
        for quant in ("none", "qk", "qkpv"):
            @jax.jit
            def run(q, k, v, quant=quant):
                def body(c, _):
                    o = flash_attention_packed(c, k, v, d_real=d, quant=quant)
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
                one = flash_attention_packed(q, k, v, d_real=d, quant=quant)
                if quant == "none":
                    base = np.asarray(one[..., :d], np.float32)
                    drift = 0.0
                else:
                    drift = float(np.max(np.abs(
                        np.asarray(one[..., :d], np.float32) - base)))
                print(f"{label} {quant:>5}: {per * 1000:7.3f} ms/call "
                      f"({flops / per / 197e12 * 100:5.1f}% bf16-padded-peak; "
                      f"max|delta| vs bf16 {drift:.4f}; compile {comp:.0f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — probe reports, not raises
                print(f"{label} {quant}: FAIL {type(e).__name__} "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
