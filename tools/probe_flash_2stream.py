#!/usr/bin/env python3
"""Probe: flash attention with TWO independent q-streams per kernel body.

Why: the int8-flash and VPU-trim probes (tools/probe_flash_int8.py,
tools/probe_flash_vpu.py, BENCHLOG) established that at d_pad=128 the
shipped kernel co-bottlenecks on MXU (QK^T + PV) and VPU (exp over the
score tile) with ~66% padded-peak utilization — each unit idles while the
other works because a single online-softmax chain is sequential:
QK^T (MXU) -> max/exp/sum (VPU) -> PV (MXU).  NOTES_r3.md idea 4 names
"a structurally different schedule (two k-streams in flight)" as the only
remaining flash lever.

This probe splits the q tile into two INDEPENDENT online-softmax chains
(separate stats scratch, same k/v tiles).  The chains share no data, so
Mosaic's scheduler is free to overlap chain 1's matmuls with chain 0's
exp passes.  If overlap happens, utilization should rise toward the
min(MXU, VPU) bound instead of their sum (~1.3-1.5x available).

Variants:
  shipped   — current kernel (bq=512 single chain)
  2q-256    — 512-row q tile as two 256-row chains
  2q-512    — 1024-row q tile as two 512-row chains

Same-process A/B, chained scan with nonlinear coupling, chain >= 500
(CLAUDE.md lessons).  Usage: python tools/probe_flash_2stream.py [chain]
"""

import functools
import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdtpu.kernels.flash_attention import (
    _NEG_BIG,
    _ceil_to,
    flash_attention_packed,
)
from sdtpu.utils.runtime import enable_compilation_cache

RTT = 0.028

SHAPES = [
    ("tiny-sd b1 512px L0", 2, 8, 4096, 40),
    ("serving b8 512px L0", 16, 8, 4096, 40),
    ("sd2.1 b1 768px L0", 2, 8, 9216, 64),
    ("sdxl b1 1024px L0", 2, 10, 16384, 64),
]


def _kernel_nq(
    q_ref, k_ref, v_ref, o_ref, *scrs,
    kv_len, block_k, sm_scale, num_k_blocks, bq, nq,
):
    ki = pl.program_id(3)
    chains_scr = [scrs[3 * i:3 * i + 3] for i in range(nq)]

    @pl.when(ki == 0)
    def _init():
        for m, l, a in chains_scr:
            m[...] = jnp.full_like(m, -jnp.inf)
            l[...] = jnp.zeros_like(l)
            a[...] = jnp.zeros_like(a)

    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    d_pad = a0_scr.shape[-1]
    pad = _ceil_to(kv_len, block_k) != kv_len

    def chain(q, m_scr, l_scr, acc_scr):
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale
        if pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ki * block_k
            s = jnp.where(col < kv_len, s, _NEG_BIG)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - jnp.tile(m_next, (1, s.shape[1] // 128)))
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * jnp.tile(alpha, (1, d_pad // 128)) + pv

    for i, (m, l, a) in enumerate(chains_scr):
        chain(q_ref[0, 0, i * bq:(i + 1) * bq, :], m, l, a)

    @pl.when(ki == num_k_blocks - 1)
    def _store():
        for off, (_, l_scr, a_scr) in enumerate(chains_scr):
            l = l_scr[...]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            out = a_scr[...] * jnp.tile(l_inv, (1, d_pad // 128))
            o_ref[0, 0, off * bq:(off + 1) * bq, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("d_real", "bq", "nq", "block_k"))
def flash_2q(q, k, v, *, d_real, bq, nq=2, block_k=1024):
    b, h, lq, d_pad = q.shape
    lk = k.shape[2]
    sm_scale = 1.0 / math.sqrt(d_real)
    tile_q = nq * bq
    assert lq % tile_q == 0, (lq, tile_q)
    block_k = min(block_k, _ceil_to(lk, 128))
    num_k_blocks = _ceil_to(lk, block_k) // block_k
    grid = (b, h, lq // tile_q, num_k_blocks)
    return pl.pallas_call(
        functools.partial(
            _kernel_nq, kv_len=lk, block_k=block_k, sm_scale=sm_scale,
            num_k_blocks=num_k_blocks, bq=bq, nq=nq,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tile_q, d_pad),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_q, d_pad),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, [128, 128, d_pad][j]), jnp.float32)
            for _ in range(nq) for j in range(3)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v)


def _sync(o):
    np.asarray(jax.device_get(o.ravel()[0]))


def main() -> None:
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for label, b, h, l, d in SHAPES:
        qkv = []
        for _ in range(3):
            x = rng.standard_normal((b, h, l, 128), dtype=np.float32)
            x[..., d:] = 0.0
            qkv.append(jnp.asarray(x, jnp.bfloat16))
        q, k, v = qkv
        flops = 2 * 2 * b * h * l * l * 128
        base = None
        for mode, fn in (
            ("shipped", lambda q, k, v: flash_attention_packed(
                q, k, v, d_real=d)),
            ("2q-256", lambda q, k, v: flash_2q(q, k, v, d_real=d, bq=256)),
            ("2q-512", lambda q, k, v: flash_2q(q, k, v, d_real=d, bq=512)),
            ("4q-256", lambda q, k, v: flash_2q(
                q, k, v, d_real=d, bq=256, nq=4)),
            ("4q-512", lambda q, k, v: flash_2q(
                q, k, v, d_real=d, bq=512, nq=4)),
            ("2q-1024", lambda q, k, v: flash_2q(
                q, k, v, d_real=d, bq=1024)),
            ("3q-512", lambda q, k, v: flash_2q(
                q, k, v, d_real=d, bq=512, nq=3)),
        ):
            @jax.jit
            def run(q, k, v, fn=fn):
                def body(c, _):
                    o = fn(c, k, v)
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
                one = fn(q, k, v)
                if base is None:
                    base = np.asarray(one[..., :d], np.float32)
                    drift = 0.0
                else:
                    drift = float(np.max(np.abs(
                        np.asarray(one[..., :d], np.float32) - base)))
                print(f"{label} {mode:>8}: {per * 1000:7.3f} ms/call "
                      f"({flops / per / 197e12 * 100:5.1f}% bf16-padded-peak;"
                      f" max|delta| vs shipped {drift:.5f};"
                      f" compile {comp:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001 — probe reports, not raises
                print(f"{label} {mode}: FAIL {type(e).__name__} "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
