#!/usr/bin/env python3
"""Block-size sweep for the shipped flash kernel at the SD2.1/SDXL level-0
shapes.

Why: the shipped defaults (block_q=512, block_k=1024) were tuned on
tiny-sd's 4096-token level-0 (BENCHLOG round 1/3).  The SD2.1 768 trace
(round 4) shows five (2, 5, 9216, d64) self-attentions at 2.80 ms each =
14 ms/step — 35% of the whole image — so a retune at 9216+ tokens is the
cheapest attack on the >= 1.0 img/s north star.  d=64 pads to 128 lanes
(2x MXU waste, structural); the sweep looks for schedule/locality wins on
top of that floor.

Same-process chained A/B (chain >= 100 is fine here: calls are ~2.8 ms,
far above the RTT-drift floor that poisons sub-0.3 ms chains — CLAUDE.md).
Nonlinear coupling between iterations so XLA cannot hoist anything.

Usage: python tools/probe_flash_blocks.py [chain]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.kernels.flash_attention import flash_attention_packed
from sdtpu.utils.runtime import enable_compilation_cache

SHAPES = [
    # (label, batch, heads, seq len, d_real)
    ("sd2.1 768 L0 (96x96, 5h, d64)", 2, 5, 9216, 64),
    ("sdxl 1024 top attn level (64x64, 10h, d64)", 2, 10, 4096, 64),
]

BLOCKS = [
    # (block_q, block_k, nq chains)
    (256, 1024, 2),
    (512, 1024, 2),   # shipped default
    (512, 2304, 2),
    (512, 4608, 2),
    (1024, 1024, 2),
    (1024, 2304, 2),
    (512, 9216, 2),
    (1024, 4608, 2),
    # chain-count sweep: more independent online-softmax chains = more
    # MXU/VPU overlap freedom for Mosaic, at the cost of scratch + per-
    # chain tail work
    (512, 1024, 3),
    (512, 2304, 3),
    (384, 1024, 4),
    (512, 1024, 4),
    (256, 1024, 1),
    (512, 1024, 1),
]

import os  # noqa: E402

if os.environ.get("SDTPU_PROBE_NQ_ONLY"):
    # rows the original block sweep (nq=2) didn't already measure
    BLOCKS = [r for r in BLOCKS if r[2] != 2] + [(512, 1024, 2)]


def time_chain(fn, q, k, v, chain, d_real):
    """fn applied chain times with nonlinear coupling through q."""

    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            o = fn(qc, k, v, d_real=d_real)
            # nonlinear coupling: abs is NOT enough (XLA collapses linear
            # chains algebraically — CLAUDE.md); tanh breaks linearity
            qc = qc + 1e-3 * jnp.tanh(o)
            return qc, ()

        out, _ = jax.lax.scan(body, q, None, length=chain)
        return out

    r = run(q, k, v)
    np.asarray(r)  # warm + sync through the relay
    t0 = time.time()
    r = run(q, k, v)
    np.asarray(r)
    dt = time.time() - t0
    return dt / chain


def main() -> None:
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    enable_compilation_cache()
    rng = np.random.default_rng(0)

    for label, b, h, l, d in SHAPES:
        d_pad = 128
        q = jnp.asarray(rng.standard_normal((b, h, l, d_pad)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, l, d_pad)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, l, d_pad)), jnp.bfloat16)
        # zero the padded tail like the real packer does
        q = q.at[..., d:].set(0)
        k = k.at[..., d:].set(0)
        v = v.at[..., d:].set(0)
        print(f"== {label}  chain={chain}")
        for bq, bk, nq in BLOCKS:
            if bk > l:
                continue

            def fn(q, k, v, d_real, _bq=bq, _bk=bk, _nq=nq):
                return flash_attention_packed(
                    q, k, v, d_real=d_real, block_q=_bq, block_k=_bk, nq=_nq
                )

            try:
                per = time_chain(fn, q, k, v, chain, d)
            except Exception as e:  # VMEM blowups etc.
                print(f"  bq={bq:5d} bk={bk:5d} nq={nq}  FAILED: {str(e)[:90]}")
                continue
            print(f"  bq={bq:5d} bk={bk:5d} nq={nq}  {per * 1e3:7.3f} ms/call")


if __name__ == "__main__":
    main()
