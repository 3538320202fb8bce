#!/usr/bin/env python3
"""Probe: flash-attention VPU-work reduction (round 3) — legacy kernel body
(unconditional key-masking + natural exp) vs the shipped one (static mask
skip when kv padding is zero + exp2 with log2e folded into the scale).

The flash kernel co-bottlenecks on VPU work at d_pad=128 (the int8 probe
showed the MXU has cycles to spare — tools/probe_flash_int8.py), so the
lever is CUTTING VPU passes per (block_q, block_k) tile: the key mask is an
iota + compare + select (3 passes) that is pure waste whenever
``_pick_block`` already makes the kv padding zero (every main self-attention
shape), and ``exp2`` saves exp's internal x*log2e multiply.

Same-process A/B, chained scan with nonlinear coupling (CLAUDE.md lessons).

Usage: python tools/probe_flash_vpu.py [chain]
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
    _pick_block,
    flash_attention_packed,
)
from sdtpu.utils.runtime import enable_compilation_cache

RTT = 0.028

# (label, b, h, l, d_real): latent self-attention shapes (CFG-doubled batch)
SHAPES = [
    ("tiny-sd b1 512px L0", 2, 8, 4096, 40),
    ("serving b8 512px L0", 16, 8, 4096, 40),
    ("sd2.1 b1 768px L0", 2, 8, 9216, 64),
    ("sdxl b1 1024px L0", 2, 10, 16384, 64),
]


def _legacy_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, kv_len, block_k, sm_scale, num_k_blocks,
):
    """The round-2 kernel body verbatim (pre VPU-trim)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < kv_len, s, _NEG_BIG)
    d_pad = acc_scr.shape[-1]
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

    @pl.when(ki == num_k_blocks - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = acc_scr[...] * jnp.tile(l_inv, (1, d_pad // 128))
        o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("d_real",))
def legacy_flash(q, k, v, *, d_real):
    b, h, lq, d_pad = q.shape
    lk = k.shape[2]
    sm_scale = 1.0 / math.sqrt(d_real)
    block_q = _pick_block(512, lq, 8)
    block_k = _pick_block(1024, lk, 128)
    num_k_blocks = _ceil_to(lk, block_k) // block_k
    grid = (b, h, _ceil_to(lq, block_q) // block_q, num_k_blocks)
    return pl.pallas_call(
        functools.partial(
            _legacy_kernel, kv_len=lk, block_k=block_k, sm_scale=sm_scale,
            num_k_blocks=num_k_blocks,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d_pad),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
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
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 100
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
            ("legacy", lambda q, k, v: legacy_flash(q, k, v, d_real=d)),
            ("shipped", lambda q, k, v: flash_attention_packed(
                q, k, v, d_real=d)),
        ):
            @jax.jit
            def run(q, k, v, fn=fn):
                def body(c, _):
                    o = fn(c, k, v)
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
                one = fn(q, k, v)
                if base is None:
                    base = np.asarray(one[..., :d], np.float32)
                    drift = 0.0
                else:
                    drift = float(np.max(np.abs(
                        np.asarray(one[..., :d], np.float32) - base)))
                print(f"{label} {mode:>7}: {per * 1000:7.3f} ms/call "
                      f"({flops / per / 197e12 * 100:5.1f}% bf16-padded-peak;"
                      f" max|delta| vs legacy {drift:.5f}; compile {comp:.0f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — probe reports, not raises
                print(f"{label} {mode}: FAIL {type(e).__name__} "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
