#!/usr/bin/env python3
"""Head-packed flash attention vs lane padding — the measured verdict
(VERDICT r4 item 5).

Idea under test: at d=40 (tiny-sd) / d=64 (SD2.1/SDXL) the kernel pads the
head dim to 128 lanes, wasting 3.2x / 2x of every QK^T and PV MXU pass.
Could packing g heads into the 128 lanes (g=3x40->120, g=2x64->128) with a
block-diagonal score mask recover it?

MAC-count analysis first: to keep per-head scores separable, the packed
K (and V) operand must be BLOCK-DIAGONAL over the g lane segments — i.e.
(g*block_k, 128) with g-1 zero segments per row.  The MXU computes zeros
all the same: packed QK^T costs bq * 128 * (g*block_k) MACs vs the padded
path's g * bq * 128 * block_k — IDENTICAL.  Same argument for PV with the
concatenated kv sequence.  Packing relocates the zeros (lane padding ->
block-diagonal operand), it cannot remove them; on top, the real packed
variant needs a per-segment softmax (extra VPU work) because row
normalization must not mix heads.

Empirical check via a MAC-exact PROXY that favors packing: the existing
kernel run at h/g heads with a g*L kv sequence executes the exact MXU
schedule the packed variant would (same grid volume, same VPU element
count) WITHOUT the segment-mask cost.  If the proxy is not faster than the
padded baseline, packing cannot win.

Device-clock methodology: chained wall-clock is relay-drift-bound tonight
(BENCHLOG round-5 note), so each config runs inside jax.profiler.trace and
the verdict comes from Pallas-op SELF time:

    python tools/probe_head_packing.py
    python tools/summarize_trace.py /tmp/hp_<label> --steps 25

Reference attention being matched: /root/reference/helpers/attention.mojo:46-60.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.kernels.flash_attention import flash_attention_packed
from sdtpu.utils.runtime import enable_compilation_cache

# (label, batch, heads, Lq, d_real, pack factor g)
CASES = [
    ("tinysd_d40", 2, 6, 4096, 40, 3),
    ("sd21_d64", 2, 4, 9216, 64, 2),
]
CHAIN = 25


def run_traced(tag, b, h, lq, lkv, d_real):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, lq, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, lkv, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, lkv, 128)), jnp.bfloat16)
    q = q.at[..., d_real:].set(0)
    k = k.at[..., d_real:].set(0)
    v = v.at[..., d_real:].set(0)

    @jax.jit
    def chain(q, k, v):
        def body(qc, _):
            o = flash_attention_packed(qc, k, v, d_real=d_real)
            return qc + 1e-3 * jnp.tanh(o), ()

        out, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return out

    np.asarray(chain(q, k, v))  # compile + warm outside the trace
    out_dir = f"/tmp/hp_{tag}"
    with jax.profiler.trace(out_dir):
        t0 = time.time()
        np.asarray(chain(q, k, v))
        dt = time.time() - t0
    print(f"{tag}: wall {dt / CHAIN * 1e3:.3f} ms/call (drift-prone; "
          f"use summarize_trace {out_dir} --steps {CHAIN})")


def main() -> None:
    enable_compilation_cache()
    for label, b, h, l, d, g in CASES:
        assert h % g == 0
        # padded baseline: h heads, kv = L
        run_traced(f"{label}_padded", b, h, l, l, d)
        # packed proxy: h/g "fat" heads, kv = g*L (MAC-identical, no mask)
        run_traced(f"{label}_packed", b, h // g, l, g * l, d)


if __name__ == "__main__":
    main()
