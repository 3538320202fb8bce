"""Flash attention (blockwise online-softmax) Pallas TPU kernel.

The framework's latent self-attention runs over H*W spatial tokens — 4096 at
512x512, 16384 at SDXL 1024x1024 — where dense attention materializes a
(4096, 4096) f32 score matrix per head per batch (the reference materializes
it too, on CPU: ``attention.mojo:46-60``).  This kernel never materializes
scores beyond one (block_q, block_k) VMEM tile, carrying the running max /
sum / accumulator of the online softmax in VMEM scratch across KV tiles.

Layout: operates directly on (B, L, H, D) — the layout
``sdtpu.ops.attention`` produces — with heads mapped to a grid dimension, so
no host-side transposes.  The head dim is zero-padded to a multiple of 128
lanes (SD head dims are 40/80/160; the MXU contracts 128-deep regardless, so
padding costs bandwidth only, and attention here is score-bound, not
V-bound).  Softmax statistics are f32 (kept broadcast across all 128 lanes so
every op stays vector-shaped); QK^T and PV accumulate f32 via
``preferred_element_type``.

Non-causal only (UNet/VAE latent attention has no mask); CLIP's causal 77-
token attention is tiny and stays on the XLA path.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)

# Default block sizes (overridable for tuning sweeps; read at import).
# Round-2 sweep at the tiny-sd 512 shapes, chained 25-step scan (ms/step):
# 256/1024 12.42, 256/2048 12.24, 512/1024 12.18 (best), 512/2048 12.30;
# bk=4096 regresses on VMEM pressure (round-1 microbench).
_BLOCK_Q = int(os.environ.get("SDTPU_FLASH_BLOCK_Q", "512"))
_BLOCK_K = int(os.environ.get("SDTPU_FLASH_BLOCK_K", "1024"))
# Independent online-softmax chains per q tile (see _kernel docstring).
# Round-5 full-UNet-step A/B (tools/ab_flash_nq.py, same-process chained
# scan, 2x repeated): nq=4 beats the round-3 nq=2 on every family —
# SD2.1 768 43.6 -> 42.6 ms/step (+2.2%), tiny-sd 512 11.09 -> 10.93
# (+1.4%), SDXL 1024 112.7 -> 112.1 (+0.5%) — more chains give Mosaic
# more MXU/VPU overlap freedom at these seq lens.
_NQ = int(os.environ.get("SDTPU_FLASH_NQ", "4"))


def _kernel(
    q_ref, k_ref, v_ref, o_ref, *rest,
    kv_len, block_k, sm_scale, num_k_blocks, bq, nq, emit_stats=False,
):
    """``nq`` INDEPENDENT online-softmax chains per body (q rows
    ``[i*bq, (i+1)*bq)`` each with private m/l/acc scratch).

    A single chain is sequential — QK^T (MXU) -> max/exp/sum (VPU) ->
    PV (MXU) — so each unit idles while the other works; the round-3 probes
    measured the shipped single-chain kernel at ~66% padded-peak with BOTH
    units co-bottlenecked (tools/probe_flash_int8.py, probe_flash_vpu.py).
    Two data-independent chains give Mosaic's scheduler freedom to overlap
    chain 1's matmuls with chain 0's exp passes: measured 66.5 -> 73.8%
    padded-peak on the tiny-sd shape, -10% at every main self-attention
    shape, bit-exact output (tools/probe_flash_2stream.py, BENCHLOG).
    """
    if emit_stats:
        m_ref, l_ref, scrs = rest[0], rest[1], rest[2:]
    else:
        scrs = rest
    ki = pl.program_id(3)
    chains_scr = [scrs[3 * i:3 * i + 3] for i in range(nq)]

    @pl.when(ki == 0)
    def _init():
        for m_scr, l_scr, acc_scr in chains_scr:
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

    k = k_ref[0, 0, :, :]  # (block_k, d_pad)
    v = v_ref[0, 0, :, :]
    d_pad = chains_scr[0][2].shape[-1]
    masked = _ceil_to(kv_len, block_k) != kv_len

    def chain(q, m_scr, l_scr, acc_scr):
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, block_k)
        s = s * sm_scale

        # mask zero-padded keys past the true kv length (skipped entirely
        # when _pick_block made the kv padding zero — every main shape)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ki * block_k
            s = jnp.where(col < kv_len, s, _NEG_BIG)

        # All softmax statistics are kept (bq, 128) with the value
        # replicated across lanes; broadcasts to (bq, block_k) and
        # (bq, d_pad) are lane-tiles (`jnp.tile` by k/128), which the VPU
        # executes natively — single-lane (bq, 1) slices force per-iteration
        # relayouts and were ~10x slower.
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)           # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)                  # (bq, 128)
        alpha = jnp.exp(m_prev - m_next)                      # (bq, 128)
        p = jnp.exp(s - jnp.tile(m_next, (1, s.shape[1] // 128)))
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, d_pad)
        acc_scr[...] = acc_scr[...] * jnp.tile(alpha, (1, d_pad // 128)) + pv

    for i, (m_scr, l_scr, acc_scr) in enumerate(chains_scr):
        chain(q_ref[0, 0, i * bq:(i + 1) * bq, :], m_scr, l_scr, acc_scr)

    @pl.when(ki == num_k_blocks - 1)
    def _store():
        for i, (m_scr, l_scr, acc_scr) in enumerate(chains_scr):
            l = l_scr[...]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            out = acc_scr[...] * jnp.tile(l_inv, (1, d_pad // 128))
            o_ref[0, 0, i * bq:(i + 1) * bq, :] = out.astype(o_ref.dtype)
            if emit_stats:
                # lane-replicated row stats for cross-shard softmax merge
                # (ring attention): m = running max, l = running sum
                m_ref[0, 0, i * bq:(i + 1) * bq, :] = m_scr[...]
                l_ref[0, 0, i * bq:(i + 1) * bq, :] = l_scr[...]


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(pref: int, length: int, mult: int) -> int:
    """Block size <= ~1.5*pref (a multiple of ``mult``) minimizing the padded
    sequence length, preferring fewer blocks on ties.

    The naive ``min(pref, ceil(length))`` clamp is exact for power-of-two
    grids (tiny-sd/SD1.5/SDXL token counts divide the 512/1024 defaults) but
    SD2.1-768's levels have 9216/2304/576 tokens: 2304 keys padded to 3 x
    1024 cost 33% wasted QK^T/PV work, and 576 queries padded to 2 x 512
    cost 78% — picking 768/576 instead makes the padding zero."""
    length_p = _ceil_to(length, mult)
    if length_p <= pref + pref // 2:
        return length_p  # single block, zero sequence padding
    best_c, best_pad = pref, _ceil_to(length, pref)
    for c in range(pref, mult - 1, -mult):
        pad = _ceil_to(length, c)
        if pad < best_pad:
            best_c, best_pad = c, pad
    return best_c


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_q: int = 256,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q @ k^T / sqrt(d)) @ v over (B, L, H, D) tensors.

    Handles arbitrary Lq/Lkv/D by zero-padding to tile multiples (padded keys
    are masked with a large negative, padded head lanes contribute zeros).
    """
    b, lq, h, d = q.shape
    d_pad = _ceil_to(d, 128)

    # (B, L, H, D) -> (B, H, L, D_pad): Mosaic wants (seq, head_dim) as
    # the trailing two block dims; the transpose is one fused pad+copy pass.
    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))

    out = flash_attention_packed(
        prep(q), prep(k), prep(v), d_real=d,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return jnp.transpose(out[..., :d], (0, 2, 1, 3))


def flash_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    d_real: int,
    block_q: int | None = None,
    block_k: int | None = None,
    nq: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Resolve the module-level block/chain knobs at CALL time (so probes
    can mutate ``_BLOCK_Q``/``_BLOCK_K``/``_NQ`` between same-process
    variants) and dispatch to the jitted impl on explicit statics — a
    jit-cached ``None`` default would silently pin the first value seen."""
    return _flash_attention_packed_impl(
        q, k, v, d_real=d_real,
        block_q=block_q if block_q is not None else _BLOCK_Q,
        block_k=block_k if block_k is not None else _BLOCK_K,
        nq=nq if nq is not None else _NQ,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("d_real", "block_q", "block_k", "nq", "interpret"),
)
def _flash_attention_packed_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    d_real: int,
    block_q: int,
    block_k: int,
    nq: int,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention on head-major PRE-PADDED tensors: q (B, H, Lq, Dp),
    k/v (B, H, Lkv, Dp) with Dp a multiple of 128 and lanes >= d_real zero.

    This is the zero-copy entry: ``sdtpu.ops.attention`` folds the head
    split + lane padding into the q/k/v projection WEIGHTS (a (C, H, Dp)
    einsum the compiler hoists out of the denoise scan), so no pad/transpose
    pass ever touches the (B, H, L, Dp) activations — the round-1 kernel
    spent an HBM round trip per call on exactly that (BENCHLOG.md).
    Returns (B, H, Lq, Dp); lanes past d_real hold zeros (PV with zero-padded
    V), so a zero-padded out-projection consumes it directly.
    """
    b, h, lq, d_pad = q.shape
    lk = k.shape[2]
    assert d_pad % 128 == 0, d_pad
    sm_scale = 1.0 / math.sqrt(d_real)

    # q tile = nq independent bq-row online-softmax chains (see _kernel);
    # picked as one nq*block_q tile so `_pick_block`'s zero-padding logic
    # still lands on divisor tiles for non-power-of-two grids (SD2.1-768:
    # 2304 -> 768-tile = two 384-chains, 576 -> 576 = two 288-chains).
    tile_q = _pick_block(nq * block_q, lq, 8 * nq)
    bq = tile_q // nq
    block_k = _pick_block(block_k, lk, 128)
    lq_pad = _ceil_to(lq, tile_q)
    lk_pad = _ceil_to(lk, block_k)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
    qp, kp, vp = q, k, v
    num_k_blocks = lk_pad // block_k
    grid = (b, h, lq_pad // tile_q, num_k_blocks)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            kv_len=lk,
            block_k=block_k,
            sm_scale=sm_scale,
            num_k_blocks=num_k_blocks,
            bq=bq,
            nq=nq,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_q, d_pad),
                lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_pad),
                lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_pad),
                lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_q, d_pad),
            lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            # per-chain running max / running sum / output accumulator
            pltpu.VMEM((bq, [128, 128, d_pad][j]), jnp.float32)
            for _ in range(nq) for j in range(3)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e has 128 MiB VMEM/core; the default 16 MiB scoped limit
            # rejects the staged output buffer at 4096-token shapes.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    return out[:, :, :lq, :]


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_stats(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_q: int = 256,
    block_k: int = 1024,
    interpret: bool = False,
):
    """Flash attention that ALSO returns the per-row softmax statistics —
    the partial-attention primitive for cross-shard merging (ring
    attention): given per-KV-block results ``(o_i, m_i, l_i)``, the exact
    global attention is the softmax-merge
    ``sum_i o_i * l_i * exp(m_i - M) / sum_i l_i * exp(m_i - M)`` with
    ``M = max_i m_i``.

    q/k/v: (B, L, H, D).  Returns ``(out, m, l)`` with out (B, Lq, H, D)
    normalized over THIS kv block, m/l (B, H, Lq) f32."""
    b, lq, h, d = q.shape
    d_pad = _ceil_to(d, 128)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))

    lk = k.shape[1]
    sm_scale = 1.0 / math.sqrt(d)
    qp, kp, vp = prep(q), prep(k), prep(v)

    nq = _NQ  # module default; the stats path has no per-call override
    tile_q = _pick_block(nq * block_q, lq, 8 * nq)
    bq = tile_q // nq
    block_k = _pick_block(block_k, lk, 128)
    lq_pad = _ceil_to(lq, tile_q)
    lk_pad = _ceil_to(lk, block_k)
    if lq_pad != lq:
        qp = jnp.pad(qp, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
    num_k_blocks = lk_pad // block_k
    grid = (b, h, lq_pad // tile_q, num_k_blocks)

    qkv_spec = [
        pl.BlockSpec((1, 1, tile_q, d_pad),
                     lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d_pad),
                     lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d_pad),
                     lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    q_out_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (1, 1, tile_q, w), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM)

    out, m, l = pl.pallas_call(
        functools.partial(
            _kernel, kv_len=lk, block_k=block_k, sm_scale=sm_scale,
            num_k_blocks=num_k_blocks, bq=bq, nq=nq, emit_stats=True,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, lq_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, h, lq_pad, 128), jnp.float32),
        ],
        grid=grid,
        in_specs=qkv_spec,
        out_specs=[q_out_spec(d_pad), q_out_spec(128), q_out_spec(128)],
        scratch_shapes=[
            pltpu.VMEM((bq, [128, 128, d_pad][j]), jnp.float32)
            for _ in range(nq) for j in range(3)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    out = jnp.transpose(out[:, :, :lq, :d], (0, 2, 1, 3))
    return out, m[:, :, :lq, 0], l[:, :, :lq, 0]


def _out_proj_kernel(o_ref, w_ref, b_ref, r_ref, out_ref, acc_scr,
                     *, num_heads):
    hi = pl.program_id(2)

    @pl.when(hi == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    acc_scr[...] += jax.lax.dot_general(
        o_ref[0, 0], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(hi == num_heads - 1)
    def _store():
        out = acc_scr[...] + b_ref[...]
        out = out + r_ref[0].astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_l", "interpret"))
def out_proj_packed(
    o: jax.Array,
    w: jax.Array,
    bias,
    residual: jax.Array,
    *,
    block_l: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``residual + einsum('bhld,hdc', o, w) + bias`` as one Pallas GEMM.

    o: (B, H, L, Dp) — the packed flash-attention output; w: (H, Dp, C)
    zero-row-padded past d_real (so the padded-lane contraction is exact);
    residual: (B, L, C).  Returns (B, L, C) in residual's dtype.

    Exists for LAYOUT, not fusion: XLA lowers the einsum form with a
    tokens-on-lanes ``{1,2,0}`` output layout that propagates down the
    whole transformer residual chain — the round-3 trace shows every
    out-proj/GeGLU-down fusion at the 64x64 level running ~40% MXU in that
    layout plus a relayout ``%copy`` back to row-major per block.  A
    custom call pins row-major operand/result layouts, and the residual
    add rides the accumulator for free."""
    b, h, l, d_pad = o.shape
    c = w.shape[-1]
    block_l = _pick_block(block_l, l, 8)
    l_pad = _ceil_to(l, block_l)
    if l_pad != l:
        o = jnp.pad(o, ((0, 0), (0, 0), (0, l_pad - l), (0, 0)))
        residual = jnp.pad(residual, ((0, 0), (0, l_pad - l), (0, 0)))
    bias_f = (
        bias.astype(jnp.float32).reshape(1, c)
        if bias is not None
        else jnp.zeros((1, c), jnp.float32)
    )

    out = pl.pallas_call(
        functools.partial(_out_proj_kernel, num_heads=h),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, c), residual.dtype),
        grid=(b, l_pad // block_l, h),
        in_specs=[
            pl.BlockSpec((1, 1, block_l, d_pad),
                         lambda bi, li, hi: (bi, hi, li, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, c),
                         lambda bi, li, hi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c),
                         lambda bi, li, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, c),
                         lambda bi, li, hi: (bi, li, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_l, c),
                               lambda bi, li, hi: (bi, li, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_l, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o, w, bias_f, residual)

    return out[:, :l, :]
