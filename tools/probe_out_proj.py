#!/usr/bin/env python3
"""Probe: flash out-projection (+skip) — Pallas layout-pinning GEMM vs XLA.

Why: the round-3 self-time trace attribution (NOTES_r3.md item 2) found
~0.93 ms/step of "matmul+bias" running at ~8% MXU in a tokens-on-lanes
``{1,2,0}`` layout, traced to the transformer's out-projections: XLA lowers
``einsum('bhld,hdc', o, w)`` with a lanes-on-tokens result layout that then
propagates down the residual chain (every downstream fusion at the 64x64
level ran ~40% MXU with a relayout %copy per block).
``out_proj_packed`` (sdtpu/kernels/flash_attention.py) pins row-major
operand/result layouts at a custom-call boundary and folds the residual add
into the accumulator.

This isolated A/B measures the kernel itself; the layout-propagation win
only shows e2e (bench.py with SDTPU_PACKED_OUT_PROJ=1 vs 0), so treat a
near-neutral isolated result as a PASS gate for the e2e measure, not a
verdict.  Chained scan with nonlinear coupling (abs) so XLA cannot hoist
the linear dot out of the scan (CLAUDE.md lesson); chain >= 500.

Usage: python tools/probe_out_proj.py [chain]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.kernels.flash_attention import out_proj_packed
from sdtpu.utils.runtime import enable_compilation_cache

RTT = 0.028

# (label, b, heads, tokens, channels) — d_pad 128 everywhere
SHAPES = [
    ("tiny-sd L0 64x64x320", 2, 8, 4096, 320),
    ("tiny-sd L1 32x32x640", 2, 8, 1024, 640),
    ("tiny-sd L2 16x16x1280", 2, 8, 256, 1280),
    ("sdxl L1 64x64x640", 2, 10, 4096, 640),
    ("sdxl L2 32x32x1280", 2, 20, 1024, 1280),
    ("sd2.1 L0 96x96x320", 2, 5, 9216, 320),
]


def _sync(o):
    np.asarray(jax.device_get(o.ravel()[0]))


def xla_out_proj(o, w, bias, residual):
    out = jnp.einsum("bhld,hdc->blc", o, w)
    return residual + (out + bias.astype(out.dtype))


def main() -> None:
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for label, b, h, l, c in SHAPES:
        o = jnp.asarray(
            rng.standard_normal((b, h, l, 128), dtype=np.float32),
            jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((h, 128, c), dtype=np.float32) * 0.02,
            jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((c,), dtype=np.float32),
                           jnp.float32)
        res = jnp.asarray(
            rng.standard_normal((b, l, c), dtype=np.float32), jnp.bfloat16)
        flops = 2 * b * h * l * 128 * c

        base = None
        for mode, fn in (
            ("xla", lambda o, res: xla_out_proj(o, w, bias, res)),
            ("pallas", lambda o, res: out_proj_packed(o, w, bias, res)),
        ):
            @jax.jit
            def run(o, res, fn=fn):
                def body(carry, _):
                    out = fn(o, carry)
                    # nonlinear coupling on the residual input only: keeps
                    # the dot un-hoistable while o/w stay loop-invariant
                    return jnp.abs(out) * 0.999, ()
                out, _ = jax.lax.scan(body, res, None, length=chain)
                return out

            try:
                t0 = time.perf_counter()
                _sync(run(o, res))
                comp = time.perf_counter() - t0
                t0 = time.perf_counter()
                _sync(run(o, res))
                wall = time.perf_counter() - t0
                per = (wall - RTT) / chain
                mxu = flops / per / 197e12 * 100 if per > 0 else float("nan")
                rel = "" if base is None else f"  ({per / base * 100:.0f}%)"
                if base is None:
                    base = per
                print(f"{label:26s} {mode:8s} {per * 1e3:7.3f} ms"
                      f"  {mxu:5.1f}% MXU  (compile {comp:.1f}s){rel}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{label:26s} {mode:8s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
