"""Multi-head attention and the SD transformer block.

Reference: ``Self_Attention``/``Cross_Attention`` (``helpers/attention.mojo``)
and the UNet transformer wiring in ``Unet_Attention_Block``
(``diffusion.mojo:75-147``).  Differences by design (SURVEY.md §5.1 items 5):

* softmax is max-subtracted and runs over the KEY axis (the reference's
  ``Softmax(dim=2)`` normalizes over queries, ``utils.mojo:435-445``);
* the 1/sqrt(head_dim) scale is folded into the logits before masking;
* logits and the softmax accumulate in float32 even under bf16 compute
  (``preferred_element_type``), keeping MXU throughput with fp32 islands.

Heads are kept as a separate batch axis of one 4-D einsum instead of the
reference's fold-into-dim0 reshape dance (``attention.mojo:37-44``) — XLA
maps this to batched MXU matmuls directly.  ``implementation="flash"``
switches the inner product to the Pallas blockwise online-softmax kernel
(``sdtpu/kernels/flash_attention.py``) for long latent sequences.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from sdtpu.ops.activations import geglu
from sdtpu.ops.linear import init_linear, linear
from sdtpu.ops.norm import init_layer_norm, layer_norm

from sdtpu.utils import hostrng

# Route the flash path's out-projection (+ skip add) through the Pallas
# layout-pinning GEMM (kernels/flash_attention.py:out_proj_packed).  Off by
# default until the on-chip A/B lands — flip via SDTPU_PACKED_OUT_PROJ=1.
_PACKED_OUT_PROJ = os.environ.get("SDTPU_PACKED_OUT_PROJ", "0") not in (
    "0", "false", "")


def attention(
    x: jax.Array,
    params: dict,
    *,
    num_heads: int,
    context: Optional[jax.Array] = None,
    causal: bool = False,
    implementation: str = "xla",
    kv_cache: Optional[dict] = None,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head (self or cross) attention.

    x: (B, Lq, D); context: (B, Lk, Dctx) or None for self-attention.
    ``kv_cache``: precomputed ``{"k", "v"}`` (B, Lk, D) cross-attention
    projections — the text context is constant across the denoise scan, so
    the pipeline hoists these out of the loop (see
    :func:`precompute_cross_kv`); XLA does not loop-invariant-motion them
    itself, and they cost a projection + relayout copy per step otherwise.

    ``residual``: optional (B, Lq, D) added to the output IN the op —
    callers with a skip connection should pass it here rather than adding
    outside: the flash path folds it into the Pallas out-projection
    (``out_proj_packed``), whose custom-call boundary also pins the
    residual chain to row-major layouts (see that kernel's docstring).
    """
    b, lq, d = x.shape
    assert d % num_heads == 0
    head_dim = d // num_heads
    ctx = x if context is None else context

    # Flash pays off for LONG key sequences (latent self-attention, 4096+
    # keys).  Cross-attention to the 77-token text context is score-cheap
    # but its packed (B, H, 77, 128) K/V force a Mosaic relayout copy every
    # denoise step (~3.2 ms/step in the round-2 XProf trace) — dense XLA
    # attention fuses those away entirely.
    if implementation == "flash" and not causal and context is None:
        return _flash_attention_fused_projections(
            x, ctx, params, num_heads=num_heads, head_dim=head_dim,
            residual=residual,
        )

    q = linear(x, params["q"]).reshape(b, lq, num_heads, head_dim)
    if kv_cache is not None:
        lk = kv_cache["k"].shape[1]
        k = kv_cache["k"].reshape(b, lk, num_heads, head_dim)
        v = kv_cache["v"].reshape(b, lk, num_heads, head_dim)
    else:
        k = linear(ctx, params["k"]).reshape(b, ctx.shape[1], num_heads, head_dim)
        v = linear(ctx, params["v"]).reshape(b, ctx.shape[1], num_heads, head_dim)

    out = None
    if implementation == "ring" and not causal:
        # sequence-parallel exact attention over the active ring_context
        # mesh axis (SURVEY.md §5 long-context row); falls back to dense
        # when no context is active or the token count doesn't shard.
        from sdtpu.parallel.ring_attention import maybe_ring_attention

        out = maybe_ring_attention(q, k, v)
    if out is None:
        out = _xla_attention(q, k, v, causal=causal)

    out = out.reshape(b, lq, d)
    out = linear(out, params["out"])
    return out if residual is None else residual + out


def _flash_attention_fused_projections(
    x: jax.Array, ctx: jax.Array, params: dict, *, num_heads: int,
    head_dim: int, residual: Optional[jax.Array] = None,
) -> jax.Array:
    """Flash path with the head split AND the 128-lane head-dim padding
    folded into the projection WEIGHTS.

    The q/k/v kernels (C, H*Dh) are reshaped to (C, H, Dh) and zero-padded to
    (C, H, Dp=128k); one einsum then emits q/k/v directly in the packed
    (B, H, L, Dp) layout the Pallas kernel reads, and the out-projection
    consumes (B, H, L, Dp) with a zero-row-padded (H, Dp, C) kernel.  The
    weight pads/reshapes are loop-invariant — XLA hoists them out of the
    denoise scan — so the (B, H, L, Dp) activations are produced and consumed
    by MXU matmuls with NO separate pad/transpose pass (which cost an HBM
    round trip per call in round 1, BENCHLOG.md)."""
    from sdtpu.kernels.flash_attention import flash_attention_packed

    d_model = num_heads * head_dim
    d_pad = ((head_dim + 127) // 128) * 128

    def head_proj(t, p):
        if "kernel_q" in p:
            # W8A8 (sdtpu/utils/quant.py): int8 weights reshape/pad to the
            # packed head layout (int8 zeros stay exact); the einsum runs
            # int8 x int8 -> int32 on the MXU's 2x path, then the per-out
            # scale / zero-point correction land per (head, lane) — padded
            # lanes get 0 * scale - 0 = exactly 0, as the packed flash
            # kernel requires.
            from sdtpu.utils.quant import quantize_act

            w = p["kernel_q"].reshape(t.shape[-1], num_heads, head_dim)
            w = jnp.pad(w, ((0, 0), (0, 0), (0, d_pad - head_dim)))
            qt = quantize_act(t, p)
            acc = jnp.einsum(
                "blc,chd->bhld", qt, w, preferred_element_type=jnp.int32
            )
            def headpad(v, fill=0.0):
                v = v.astype(jnp.float32).reshape(num_heads, head_dim)
                return jnp.pad(v, ((0, 0), (0, d_pad - head_dim)),
                               constant_values=fill)
            out = acc.astype(jnp.float32) * headpad(p["w_scale"], 1.0)[None, :, None, :]
            out = out - headpad(p["zp_corr"])[None, :, None, :]
            if "bias" in p:
                out = out + headpad(p["bias"])[None, :, None, :]
            return out.astype(t.dtype)
        w = p["kernel"].reshape(t.shape[-1], num_heads, head_dim)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, d_pad - head_dim)))
        out = jnp.einsum("blc,chd->bhld", t, w)
        if "bias" in p:
            bias = p["bias"].reshape(num_heads, head_dim)
            bias = jnp.pad(bias, ((0, 0), (0, d_pad - head_dim)))
            out = out + bias[None, :, None, :].astype(out.dtype)
        return out

    q = head_proj(x, params["q"])
    k = head_proj(ctx, params["k"])
    v = head_proj(ctx, params["v"])
    o = flash_attention_packed(q, k, v, d_real=head_dim)  # (B, H, L, Dp)

    po = params["out"]
    if "kernel_q" in po:
        # dynamically-quantized out-projection (quant.py:_quantize_linear_dyn):
        # per-(b, l)-row runtime abs-max scale over all heads/lanes — the
        # packed zero pad lanes quantize to exactly 0, and the int8 weight
        # zero-pads exactly, so the padded contraction stays exact.
        wo = po["kernel_q"].reshape(num_heads, head_dim, d_model)
        wo = jnp.pad(wo, ((0, 0), (0, d_pad - head_dim), (0, 0)))
        of = o.astype(jnp.float32)
        amax = jnp.max(jnp.abs(of), axis=(1, 3), keepdims=True)  # (B,1,L,1)
        scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        qo = jnp.round(of / scale).astype(jnp.int8)
        acc = jnp.einsum(
            "bhld,hdc->blc", qo, wo, preferred_element_type=jnp.int32
        )
        out = acc.astype(jnp.float32) * scale[:, 0, :, :]
        out = out * po["w_scale"].astype(jnp.float32)
        if "bias" in po:
            out = out + po["bias"].astype(jnp.float32)
        out = out.astype(x.dtype)
        return out if residual is None else residual + out

    wo = po["kernel"].reshape(num_heads, head_dim, d_model)
    wo = jnp.pad(wo, ((0, 0), (0, d_pad - head_dim), (0, 0)))
    if (residual is not None and jax.default_backend() != "cpu"
            and _PACKED_OUT_PROJ):
        # Pallas out-projection with the skip fold; pins the (B, L, C)
        # residual chain to row-major — the einsum form's tokens-on-lanes
        # output layout propagated through every downstream matmul of the
        # transformer block at ~40% MXU (round-3 trace; kernel docstring).
        from sdtpu.kernels.flash_attention import out_proj_packed

        return out_proj_packed(o, wo, po.get("bias"), residual)
    # (a per-head "bhld,hdc->bhlc" matmul + head-sum split was tried against
    # this direct contraction — e2e neutral; XLA overlaps the conv-lowered
    # form fine, and the split costs an extra (B,H,L,C) HBM intermediate)
    out = jnp.einsum("bhld,hdc->blc", o, wo)
    if "bias" in params["out"]:
        out = out + params["out"]["bias"].astype(out.dtype)
    return out if residual is None else residual + out


def _xla_attention(q, k, v, *, causal: bool) -> jax.Array:
    """Dense attention: (B, L, H, Dh) inputs, f32 logits/softmax."""
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((lq, lk), dtype=bool))
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def init_attention(
    key: jax.Array,
    dim: int,
    *,
    context_dim: Optional[int] = None,
    qkv_bias: bool = True,
    out_bias: bool = True,
    dtype=jnp.float32,
) -> dict:
    """Separate q/k/v/out projections (the reference fuses self-attention QKV
    into one Linear(d, 3d), ``attention.mojo:17``; separate projections map
    1:1 onto diffusers' to_q/to_k/to_v checkpoint tensors)."""
    ctx = dim if context_dim is None else context_dim
    kq, kk, kv, ko = hostrng.split(key, 4)
    return {
        "q": init_linear(kq, dim, dim, use_bias=qkv_bias, dtype=dtype),
        "k": init_linear(kk, ctx, dim, use_bias=qkv_bias, dtype=dtype),
        "v": init_linear(kv, ctx, dim, use_bias=qkv_bias, dtype=dtype),
        "out": init_linear(ko, dim, dim, use_bias=out_bias, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# BasicTransformerBlock: LN -> self-attn -> LN -> cross-attn -> LN -> GeGLU FF
# (the inner body of Unet_Attention_Block, diffusion.mojo:112-147).
# ---------------------------------------------------------------------------


def transformer_block(
    x: jax.Array,
    params: dict,
    *,
    num_heads: int,
    context: jax.Array,
    implementation: str = "xla",
    cross_kv: Optional[dict] = None,
    pag_tail: int = 0,
) -> jax.Array:
    """``pag_tail``: Perturbed-Attention Guidance (Ahn et al. 2024;
    diffusers ``pag_scale``) — the last ``pag_tail`` batch rows replace
    self-attention with IDENTITY attention (each query attends only to
    itself, so the attention output degenerates to out_proj(V(h))).  The
    split is static, so the perturbed rows skip the attention compute
    entirely; ``linear`` keeps the int8-quantized v/out kernels working
    unchanged.  Cross-attention and the FF are shared by all rows."""
    h = layer_norm(x, params["norm1"])
    if pag_tail:
        hp = h[-pag_tail:]
        ident = linear(linear(hp, params["attn1"]["v"]), params["attn1"]["out"])
        head = attention(
            h[:-pag_tail], params["attn1"], num_heads=num_heads,
            implementation=implementation, residual=x[:-pag_tail],
        )
        x = jnp.concatenate([head, x[-pag_tail:] + ident])
    else:
        x = attention(
            h, params["attn1"], num_heads=num_heads,
            implementation=implementation, residual=x,
        )
    h = layer_norm(x, params["norm2"])
    x = attention(
        h,
        params["attn2"],
        num_heads=num_heads,
        context=context,
        implementation=implementation,
        kv_cache=cross_kv,
        residual=x,
    )
    h = layer_norm(x, params["norm3"])
    h = geglu(linear(h, params["ff"]["proj"]))
    return x + linear(h, params["ff"]["out"])


def precompute_transformer_cross_kv(context: jax.Array, params: dict) -> dict:
    """Cross-attention K/V for one BasicTransformerBlock — the denoise-scan
    loop-invariant (context never changes across steps)."""
    return {
        "k": linear(context, params["attn2"]["k"]),
        "v": linear(context, params["attn2"]["v"]),
    }


def init_geglu(key: jax.Array, dim: int, *, mult: int = 4, dtype=jnp.float32) -> dict:
    """Linear(ch, 2*mult*ch) -> GeGLU -> Linear(mult*ch, ch)
    (``diffusion.mojo:96-97``: proj to 8x, gate halves to 4x)."""
    k1, k2 = hostrng.split(key)
    return {
        "proj": init_linear(k1, dim, 2 * mult * dim, dtype=dtype),
        "out": init_linear(k2, mult * dim, dim, dtype=dtype),
    }


def init_transformer_block(
    key: jax.Array,
    dim: int,
    *,
    context_dim: int,
    dtype=jnp.float32,
) -> dict:
    k1, k2, k3 = hostrng.split(key, 3)
    return {
        "norm1": init_layer_norm(dim, dtype=dtype),
        "attn1": init_attention(k1, dim, qkv_bias=False, dtype=dtype),
        "norm2": init_layer_norm(dim, dtype=dtype),
        "attn2": init_attention(
            k2, dim, context_dim=context_dim, qkv_bias=False, dtype=dtype
        ),
        "norm3": init_layer_norm(dim, dtype=dtype),
        "ff": init_geglu(k3, dim, dtype=dtype),
    }
