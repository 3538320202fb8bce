"""CLIP text encoder (reference: ``clip.mojo``).

Architecture per ``clip.mojo:56-109``: token embedding + learned positional
embedding (``clip.mojo:5-20``), 12 pre-LN transformer blocks with causal
self-attention and a QuickGELU MLP (``clip.mojo:23-53``), final LayerNorm.
The reference unrolls the 12 blocks into separate struct fields
(player1..player12, ``clip.mojo:57-69``); here blocks are a stacked pytree
scanned with ``jax.lax.scan`` so the compiled program contains ONE block body
regardless of depth (compile-time stays flat for SDXL's 32-layer bigG).

Parameterized by :class:`sdtpu.config.CLIPConfig` so the same code serves
OpenAI CLIP ViT-L (SD 1.x / Tiny-SD) and OpenCLIP bigG (SDXL).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sdtpu.config import CLIPConfig
from sdtpu.ops import (
    attention,
    embedding_lookup,
    init_attention,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    quick_gelu,
)
from sdtpu.ops.activations import gelu_erf

from sdtpu.utils import hostrng


def _act(name: str):
    # HF CLIP "gelu" is erf-exact (torch nn.GELU default) — the tanh
    # approximation drifts ~1e-3 and breaks bit-parity with transformers.
    return quick_gelu if name == "quick_gelu" else gelu_erf


def encoder_layer(
    x: jax.Array, params: dict, *, num_heads: int, act: str, eps: float
) -> jax.Array:
    """One pre-LN block: LN -> causal self-attn -> res; LN -> MLP -> res
    (``clip.mojo:37-53``)."""
    h = layer_norm(x, params["norm1"], eps=eps)
    x = x + attention(h, params["attn"], num_heads=num_heads, causal=True)
    h = layer_norm(x, params["norm2"], eps=eps)
    h = linear(h, params["mlp"]["fc1"])
    h = _act(act)(h)
    return x + linear(h, params["mlp"]["fc2"])


def clip_encode(
    token_ids: jax.Array,
    params: dict,
    config: CLIPConfig,
    *,
    clip_skip: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Encode (B, L) token ids.

    Returns ``(hidden, pooled)`` where ``hidden`` is (B, L, D) — the final
    LayerNorm output for SD 1.x (``clip.mojo:106-108``) or the penultimate
    hidden state when ``config.use_final_layer_norm_output`` is False (SDXL's
    second encoder) — and ``pooled`` is the final-LN state at each sequence's
    EOS position (argmax of ids, the HF convention), used by SDXL
    micro-conditioning.

    ``clip_skip``: take the hidden state ``clip_skip`` layers before the
    model's usual output layer (diffusers semantics: ``clip_skip=1`` = the
    community "CLIP skip 2" = penultimate for SD 1.x; composes additively
    with the bigG penultimate default).  The skipped tail layers still run
    once for the pooled output — the scan is simply split at the tap point
    (stacked layer params sliced statically), so nothing is recomputed and
    no per-layer stack is materialized.
    """
    b, seq_len = token_ids.shape
    x = embedding_lookup(token_ids, params["token_embedding"])
    x = x + params["position_embedding"][None, :seq_len, :].astype(x.dtype)

    def body(carry, layer_params):
        out = encoder_layer(
            carry,
            layer_params,
            num_heads=config.num_heads,
            act=config.hidden_act,
            eps=config.layer_norm_eps,
        )
        return out, None

    # layers from the end whose output the conditioning does NOT use: the
    # user's clip_skip plus SDXL-bigG's built-in penultimate tap
    eff_skip = clip_skip + (0 if config.use_final_layer_norm_output else 1)
    if not 0 <= eff_skip < config.num_layers:
        raise ValueError(f"clip_skip {clip_skip} out of range")
    n_head = config.num_layers - eff_skip
    if eff_skip == 0:
        final, _ = jax.lax.scan(body, x, params["layers"])
        h = final
    else:
        head = jax.tree.map(lambda a: a[:n_head], params["layers"])
        tail = jax.tree.map(lambda a: a[n_head:], params["layers"])
        h, _ = jax.lax.scan(body, x, head)
        final, _ = jax.lax.scan(body, h, tail)

    normed = layer_norm(final, params["final_norm"], eps=config.layer_norm_eps)

    eos_pos = jnp.argmax(token_ids, axis=-1)
    pooled = jnp.take_along_axis(normed, eos_pos[:, None, None], axis=1)[:, 0]
    if config.projection_dim is not None:
        pooled = linear(pooled, params["text_projection"])

    if config.use_final_layer_norm_output:
        hidden = normed if eff_skip == 0 else layer_norm(
            h, params["final_norm"], eps=config.layer_norm_eps)
    else:
        hidden = h
    return hidden, pooled


def init_clip(
    key: jax.Array, config: CLIPConfig, *, dtype=jnp.float32
) -> dict:
    """Random-init parameter pytree (layers stacked along a leading axis)."""
    host = isinstance(key, (int, hostrng.HostKey))
    key = hostrng.ensure_key(key)
    d = config.hidden_size
    keys = hostrng.split(key, config.num_layers + 3)

    def init_layer(k):
        k1, k2, k3 = hostrng.split(k, 3)
        return {
            "norm1": init_layer_norm(d, dtype=dtype),
            "attn": init_attention(k1, d, qkv_bias=True, dtype=dtype),
            "norm2": init_layer_norm(d, dtype=dtype),
            "mlp": {
                "fc1": init_linear(k2, d, config.intermediate_size, dtype=dtype),
                "fc2": init_linear(k3, config.intermediate_size, d, dtype=dtype),
            },
        }

    layers = [init_layer(k) for k in keys[: config.num_layers]]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    params = {
        "token_embedding": init_embedding(
            keys[-3], config.vocab_size, d, dtype=dtype
        ),
        "position_embedding": hostrng.normal(
            keys[-2], (config.max_length, d), dtype
        )
        * 0.01,
        "layers": stacked,
        "final_norm": init_layer_norm(d, dtype=dtype),
    }
    if config.projection_dim is not None:
        params["text_projection"] = init_linear(
            keys[-1], d, config.projection_dim, use_bias=False, dtype=dtype
        )
    return jax.tree.map(jnp.asarray, params) if host else params


def clip_encode_windows(
    token_ids: jax.Array,
    params: dict,
    config: CLIPConfig,
    *,
    clip_skip: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`clip_encode` with long-prompt chunking (the community
    "long prompt" scheme, ``bpe.py:encode_long``): (B, n*W) ids run as B*n
    independent W-token windows through ONE batched encoder call (each
    window gets its own position embeddings), hidden states re-concatenated
    to a (B, n*W, D) cross-attention context.  The pooled output (SDXL
    micro-conditioning) is the FIRST window's — the community convention.
    n == 1 (the common case) is exactly :func:`clip_encode`."""
    b, L = token_ids.shape
    if L <= config.max_length:
        return clip_encode(token_ids, params, config, clip_skip=clip_skip)
    if L % config.max_length:
        raise ValueError(
            f"token_ids length {L} must be a multiple of the CLIP window "
            f"({config.max_length}) — chunk long prompts per window "
            "(tokenizer.encode_long)"
        )
    n = L // config.max_length
    flat = token_ids.reshape(b * n, config.max_length)
    hidden, pooled = clip_encode(flat, params, config, clip_skip=clip_skip)
    hidden = hidden.reshape(b, L, hidden.shape[-1])
    return hidden, pooled.reshape(b, n, -1)[:, 0]
